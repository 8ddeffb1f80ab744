"""Thai query fixture set (shape of the reference's data/samples/test_queries.json:
id, query, search_type, difficulty; 8 basic / 17 intermediate / 10 advanced split).

expected_top_k is NOT hand-written — tests derive it from the single-node BM25
oracle over the synthetic corpus (FIXTURES.md §3)."""

QUERY_FIXTURES = [
    # --- basic (8) ---
    {"qid": "exact_compound_001", "query": "สาหร่ายวากาเมะ", "search_type": "exact_compound", "difficulty": "basic"},
    {"qid": "exact_compound_002", "query": "ปัญญาประดิษฐ์", "search_type": "exact_compound", "difficulty": "basic"},
    {"qid": "simple_thai_001", "query": "อาหาร", "search_type": "partial_compound", "difficulty": "basic"},
    {"qid": "simple_thai_002", "query": "เทคโนโลยี", "search_type": "partial_compound", "difficulty": "basic"},
    {"qid": "english_001", "query": "machine", "search_type": "english_in_thai", "difficulty": "basic"},
    {"qid": "english_002", "query": "data cloud", "search_type": "english_in_thai", "difficulty": "basic"},
    {"qid": "number_001", "query": "1500", "search_type": "numeric", "difficulty": "basic"},
    {"qid": "brand_001", "query": "AI", "search_type": "brand", "difficulty": "basic"},
    # --- intermediate (17) ---
    {"qid": "compound_ctx_001", "query": "สลัดสาหร่ายวากาเมะ", "search_type": "multi_term_compound", "difficulty": "intermediate"},
    {"qid": "compound_ctx_002", "query": "อาหารทะเลญี่ปุ่น", "search_type": "multi_term_compound", "difficulty": "intermediate"},
    {"qid": "compound_ctx_003", "query": "คอมพิวเตอร์และเทคโนโลยี", "search_type": "multi_term_compound", "difficulty": "intermediate"},
    {"qid": "nospace_001", "query": "กินข้าวผัดไทย", "search_type": "no_whitespace", "difficulty": "intermediate"},
    {"qid": "nospace_002", "query": "เรียนภาษาญี่ปุ่น", "search_type": "no_whitespace", "difficulty": "intermediate"},
    {"qid": "nospace_003", "query": "ท่องเที่ยวเชียงใหม่", "search_type": "no_whitespace", "difficulty": "intermediate"},
    {"qid": "mixed_001", "query": "Machine Learning ไทย", "search_type": "mixed_language", "difficulty": "intermediate"},
    {"qid": "mixed_002", "query": "Startup ไทย", "search_type": "mixed_language", "difficulty": "intermediate"},
    {"qid": "mixed_003", "query": "IoT เกษตร", "search_type": "mixed_language", "difficulty": "intermediate"},
    {"qid": "jp_compound_001", "query": "ซูชิ", "search_type": "thai_japanese_compound", "difficulty": "intermediate"},
    {"qid": "jp_compound_002", "query": "ซาชิมิและเทมปุระ", "search_type": "thai_japanese_compound", "difficulty": "intermediate"},
    {"qid": "business_001", "query": "การตลาดออนไลน์", "search_type": "multi_term_compound", "difficulty": "intermediate"},
    {"qid": "education_001", "query": "ทุนการศึกษามหาวิทยาลัย", "search_type": "multi_term_compound", "difficulty": "intermediate"},
    {"qid": "medical_001", "query": "โรงพยาบาลและวัคซีน", "search_type": "multi_term_compound", "difficulty": "intermediate"},
    {"qid": "travel_001", "query": "โรงแรมชายหาด", "search_type": "multi_term_compound", "difficulty": "intermediate"},
    {"qid": "sport_001", "query": "ฟุตบอลมวยไทย", "search_type": "multi_term_compound", "difficulty": "intermediate"},
    {"qid": "entertain_001", "query": "ภาพยนตร์และดนตรี", "search_type": "multi_term_compound", "difficulty": "intermediate"},
    # --- advanced (10) ---
    {"qid": "stopword_heavy_001", "query": "ที่และหรือแต่ในเป็นอาหาร", "search_type": "stop_word_heavy", "difficulty": "advanced"},
    {"qid": "long_phrase_001", "query": "ปัญญาประดิษฐ์และการเรียนรู้ของเครื่องคอมพิวเตอร์", "search_type": "long_phrase", "difficulty": "advanced"},
    {"qid": "long_phrase_002", "query": "สาหร่ายวากาเมะเป็นอาหารทะเล", "search_type": "long_phrase", "difficulty": "advanced"},
    {"qid": "unknown_run_001", "query": "ฟหกดเดสว", "search_type": "unknown_tokens", "difficulty": "advanced"},
    {"qid": "empty_result_001", "query": "zzzzqqqq", "search_type": "empty_result", "difficulty": "advanced"},
    {"qid": "punct_001", "query": "!!! อาหาร ???", "search_type": "punctuation", "difficulty": "advanced"},
    {"qid": "mixed_heavy_001", "query": "Big Data เศรษฐกิจดิจิทัล", "search_type": "mixed_language", "difficulty": "advanced"},
    {"qid": "compound_split_001", "query": "การเรียนรู้", "search_type": "compound_split", "difficulty": "advanced"},
    {"qid": "rare_term_001", "query": "อุทยานแห่งชาติ", "search_type": "rare_term", "difficulty": "advanced"},
    {"qid": "glue_only_001", "query": "และหรือแต่", "search_type": "stop_words_only", "difficulty": "advanced"},
]
