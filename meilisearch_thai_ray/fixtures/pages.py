"""Deterministic synthetic Common-Crawl-style `pages` corpus (FIXTURES.md §1).

Schema (BASELINE.json input_hint): url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string.

Generation (seed fixed, no wall-clock entropy):
  * Thai sentences are concatenations of dictionary words WITHOUT spaces (the
    no-whitespace segmentation case), with stop words as high-frequency Zipf
    glue and compound words sampled from the category dictionary.
  * lang buckets by i % 20: 0-13 "th", 14-16 "en", 17-19 "mixed".
  * mixed docs embed English/brand tokens ("Machine Learning", "Startup ไทย",
    "IoT เกษตร" — mirroring the reference load-test query list,
    tests/performance/load_test.py:17-36).
  * golden sentences embedded verbatim in known docs (the wakame regression,
    tests/integration/test_wakame_compound_words.py:31-48).
  * ~10% of docs wrap the text in nested tags / attributes / entities to
    exercise the extractor; html is constructed so that
    kernel.extract.html_to_text(html) == text EXACTLY (generator invariant,
    asserted in tests).
"""

from __future__ import annotations

import html as _html
import random
from datetime import datetime, timedelta

import pyarrow as pa

from ..config import load_base_words, load_compound_dict

_EPOCH = datetime(2025, 1, 1)

ENGLISH_WORDS = [
    "machine", "learning", "data", "cloud", "software", "startup", "iot",
    "mobile", "online", "digital", "platform", "service", "system", "network",
    "search", "index", "engine", "open", "source", "code", "market", "travel",
    "food", "health", "sport", "music", "news", "tech", "thailand", "bangkok",
]

BRAND_PHRASES = ["Machine Learning", "Startup ไทย", "IoT เกษตร", "Big Data", "AI"]

GOLDEN_SENTENCES = [
    "สาหร่ายวากาเมะเป็นอาหารทะเล",
    "สลัดสาหร่ายวากาเมะแบบญี่ปุ่น",
    "ปัญญาประดิษฐ์และการเรียนรู้ของเครื่องคอมพิวเตอร์",
    "ร้านอาหารญี่ปุ่นขายซูชิและซาชิมิ",
]


def _zipf_cumweights(n: int):
    import numpy as np

    w = 1.0 / (np.arange(n, dtype=np.float64) + 1.0)
    c = np.cumsum(w)
    return c / c[-1]


class _Vocab:
    """Vocabulary with precomputed cumulative Zipf weights (sampling is a
    vectorized searchsorted — the generator must keep up with the pipeline)."""

    def __init__(self) -> None:
        import numpy as np

        base = load_base_words()
        compounds = load_compound_dict()
        # stop-word glue first => Zipf head lands on them
        self.thai_words = np.asarray(base + compounds, dtype=object)
        self.thai_cumw = _zipf_cumweights(len(self.thai_words))
        self.compounds = compounds
        self.english = np.asarray(ENGLISH_WORDS, dtype=object)
        self.english_cumw = _zipf_cumweights(len(ENGLISH_WORDS))


def _pick(rng: random.Random, vocab_arr, cumw, k: int) -> list:
    import numpy as np

    u = np.array([rng.random() for _ in range(k)]) if k <= 4 else None
    if u is None:
        # bulk draws: one rng.random() seeds a numpy generator for vector draws
        g = np.random.default_rng(int(rng.random() * 2**63))
        u = g.random(k)
    idx = np.searchsorted(cumw, u)
    return list(vocab_arr[idx])


def _thai_sentence(rng: random.Random, vocab: _Vocab, n_words: int) -> str:
    words = _pick(rng, vocab.thai_words, vocab.thai_cumw, n_words)
    if rng.random() < 0.5:  # guarantee compound coverage
        words.insert(rng.randrange(len(words) + 1), rng.choice(vocab.compounds))
    return "".join(words)  # no spaces between Thai words


def _english_sentence(rng: random.Random, vocab: _Vocab, n_words: int) -> str:
    return " ".join(_pick(rng, vocab.english, vocab.english_cumw, n_words))


def _mixed_sentence(rng: random.Random, vocab: _Vocab) -> str:
    parts = [
        _thai_sentence(rng, vocab, rng.randint(3, 6)),
        rng.choice(BRAND_PHRASES),
        _thai_sentence(rng, vocab, rng.randint(2, 5)),
    ]
    if rng.random() < 0.3:
        parts.append(str(rng.randint(1, 9999)))
    return " ".join(parts)


def _doc_text(i: int, rng: random.Random, vocab: _Vocab, lang: str,
              lines_range: tuple[int, int] = (2, 5)) -> tuple[str, str]:
    """(title, body) — both already whitespace-normalized (single spaces,
    stripped lines) so the extractor round-trip is exact."""
    lo, hi = lines_range
    if lang == "en":
        title = _english_sentence(rng, vocab, rng.randint(2, 5))
        lines = [_english_sentence(rng, vocab, rng.randint(6, 14))
                 for _ in range(rng.randint(lo, hi))]
    else:
        title = _thai_sentence(rng, vocab, rng.randint(2, 4))
        mk = _mixed_sentence if lang == "mixed" else (
            lambda r, v: _thai_sentence(r, v, rng.randint(5, 12)))
        lines = [mk(rng, vocab) for _ in range(rng.randint(lo, hi))]
    if i % 37 == 0:  # embed golden sentences deterministically
        lines.insert(0, GOLDEN_SENTENCES[(i // 37) % len(GOLDEN_SENTENCES)])
    return title, "\n".join(lines)


def _render_html(title: str, body: str, fancy: bool) -> str:
    esc = _html.escape
    body_html = "".join(f"<p>{esc(line)}</p>" for line in body.split("\n"))
    if fancy:
        return (
            f'<html><head><title>{esc(title)}</title>'
            f'<style>p {{margin: 0}}</style>'
            f'<script type="text/javascript">var t = "<p>junk</p>";</script></head>'
            f'<body class="page"><!-- comment --><header><h1>{esc(title)}</h1></header>'
            f'<div id="main"><section>{body_html}</section></div></body></html>'
        )
    return (
        f"<html><head><title>{esc(title)}</title></head>"
        f"<body><h1>{esc(title)}</h1>{body_html}</body></html>"
    )


def generate_pages(n_rows: int, seed: int = 42, start: int = 0,
                   lines_range: tuple[int, int] = (2, 5)) -> pa.Table:
    """Rows [start, start+n_rows) of the corpus. Row i depends only on
    (seed, i, lines_range) — sharded generation at any parallelism produces
    identical rows. lines_range controls document size: (2,5) ≈ 200 chars for
    unit tests; (20,50) ≈ 2 KB — realistic web-page text — for benchmarks."""
    vocab = _Vocab()
    urls, ts, htmls, texts, langs = [], [], [], [], []
    for i in range(start, start + n_rows):
        rng = random.Random((seed << 32) ^ i)
        b = i % 20
        lang = "th" if b < 14 else ("en" if b < 17 else "mixed")
        title, body = _doc_text(i, rng, vocab, lang, lines_range)
        # html_to_text renders: title (from <title>), then h1 title again, then body lines
        text = f"{title}\n{title}\n{body}"
        html = _render_html(title, body, fancy=(i % 10 == 3))
        urls.append(f"https://site{i % 101}.example.th/p/{i:08d}")
        ts.append(_EPOCH + timedelta(seconds=i))
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_parquet(out_dir: str, n_rows: int, seed: int = 42,
                        rows_per_file: int = 5000,
                        lines_range: tuple[int, int] = (2, 5),
                        parallel: bool = False) -> list[str]:
    """Write the corpus as a directory of parquet files (one per row-range
    shard — the resumable layout the index build consumes). With parallel=True
    and Ray initialised, shards generate as Ray tasks (row i depends only on
    (seed, i), so sharded generation is bit-identical to serial)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    todo = []
    paths = []
    for start in range(0, n_rows, rows_per_file):
        n = min(rows_per_file, n_rows - start)
        p = os.path.join(out_dir, f"pages-{start:010d}.parquet")
        paths.append(p)
        if not os.path.exists(p):
            todo.append((start, n, p))
    if not todo:
        return paths
    if parallel:
        import ray

        @ray.remote
        def _gen(start: int, n: int, p: str) -> None:
            t = generate_pages(n, seed=seed, start=start, lines_range=lines_range)
            tmp = p + f".tmp.{os.getpid()}"
            pq.write_table(t, tmp)
            os.replace(tmp, p)

        ray.get([_gen.remote(s, n, p) for s, n, p in todo])
    else:
        for s, n, p in todo:
            pq.write_table(generate_pages(n, seed=seed, start=s, lines_range=lines_range), p)
    return paths
