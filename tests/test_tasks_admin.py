"""Task ledger (Meilisearch GET /tasks lifecycle) + IndexAdmin facade +
index stats endpoint."""

import json
import os

import pytest

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.fixtures.pages import write_pages_parquet
from meilisearch_thai_ray.index.admin import IndexAdmin
from meilisearch_thai_ray.index.build import build_index
from meilisearch_thai_ray.index.maintenance import index_stats, registry_set
from meilisearch_thai_ray.index.search import SearchEngine
from meilisearch_thai_ray.state.tasks import (
    TaskFailedError,
    TaskLedger,
    tracked,
)

CFG = EngineConfig(num_shards=4)


# ------------------------------------------------------------- pure ledger

def test_ledger_lifecycle_and_filters(tmp_path):
    led = TaskLedger(str(tmp_path / "tasks.jsonl"))
    a = led.enqueue("indexCreation", "docs")
    b = led.enqueue("documentAdditionOrUpdate", "docs")
    c = led.enqueue("indexSwap")
    assert (a, b, c) == (0, 1, 2)  # monotonic uids

    led.start(b)
    led.succeed(b, {"indexedDocuments": 5})
    led.start(c)
    led.fail(c, "boom")

    assert led.get_task(a)["status"] == "enqueued"
    done = led.get_task(b)
    assert done["status"] == "succeeded"
    assert done["details"]["indexedDocuments"] == 5
    assert done["startedAt"] <= done["finishedAt"]
    failed = led.get_task(c)
    assert failed["status"] == "failed"
    assert failed["error"]["message"] == "boom"

    # newest-first + filters (GET /tasks surface)
    assert [t["uid"] for t in led.tasks()] == [2, 1, 0]
    assert [t["uid"] for t in led.tasks(statuses=["succeeded"])] == [1]
    assert [t["uid"] for t in led.tasks(types=["indexSwap"])] == [2]
    assert [t["uid"] for t in led.tasks(index_uids=["docs"])] == [1, 0]
    assert [t["uid"] for t in led.tasks(from_uid=1)] == [1, 0]
    assert len(led.tasks(limit=2)) == 2


def test_ledger_terminal_states_are_final(tmp_path):
    led = TaskLedger(str(tmp_path / "t.jsonl"))
    u = led.enqueue("indexSwap")
    led.start(u)
    led.succeed(u)
    with pytest.raises(ValueError):
        led.fail(u, "late")


def test_wait_for_task_paths(tmp_path):
    led = TaskLedger(str(tmp_path / "t.jsonl"))
    ok = led.enqueue("indexSwap")
    led.start(ok)
    led.succeed(ok)
    assert led.wait_for_task(ok)["status"] == "succeeded"

    bad = led.enqueue("indexSwap")
    led.start(bad)
    led.fail(bad, "broken shard")
    with pytest.raises(TaskFailedError, match="broken shard"):
        led.wait_for_task(bad)

    hang = led.enqueue("indexSwap")
    with pytest.raises(TimeoutError):
        led.wait_for_task(hang, timeout=0.15, interval=0.02)


def test_cancel_and_delete_tasks(tmp_path):
    led = TaskLedger(str(tmp_path / "t.jsonl"))
    a = led.enqueue("indexSwap")
    b = led.enqueue("indexSwap")
    led.start(b)
    led.succeed(b)
    got = led.cancel_tasks([a, b, 99])
    assert got == [a]  # finished + unknown untouched
    assert led.get_task(a)["status"] == "canceled"
    # the cancelation itself is a recorded, succeeded task
    cancel_rec = led.tasks(types=["taskCancelation"])[0]
    assert cancel_rec["status"] == "succeeded"
    assert cancel_rec["details"] == {"matchedTasks": 3, "canceledTasks": 1}

    # delete: finished only; the log compacts but survivors keep history
    n = led.delete_tasks([a, b])
    assert n == 2
    with pytest.raises(KeyError):
        led.get_task(b)
    assert led.get_task(cancel_rec["uid"])["status"] == "succeeded"


def test_tracked_failure_records_and_reraises(tmp_path):
    led = TaskLedger(str(tmp_path / "t.jsonl"))
    with pytest.raises(RuntimeError):
        with tracked(led, "documentDeletion", "docs"):
            raise RuntimeError("disk gone")
    rec = led.tasks()[0]
    assert rec["status"] == "failed"
    assert "disk gone" in rec["error"]["message"]

    # ledger=None is a no-op shim
    with tracked(None, "documentDeletion") as t:
        assert t["uid"] is None


# ------------------------------------------- admin facade over a real index

@pytest.fixture(scope="module")
def admin_env(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("admin")
    pages = str(root / "pages")
    out = str(root / "index")
    write_pages_parquet(pages, 120, rows_per_file=60)
    build_index(pages, out, CFG, num_salts=1, batch_size=64)
    adm = IndexAdmin(str(root / "registry.json"))
    adm.wait_for_task(adm.create_index("docs", out))
    return str(root), out, adm


def test_admin_mutations_return_polled_task_uids(admin_env, tmp_path):
    root, out, adm = admin_env
    eng = SearchEngine(out)
    hits = eng.search("ray", k=5)
    victim = hits[0]["doc_id"] if hits else 0

    uid = adm.delete_documents("docs", [victim])
    rec = adm.wait_for_task(uid)
    assert rec["type"] == "documentDeletion"
    assert rec["details"]["deletedDocuments"] == 1
    assert rec["indexUid"] == "docs"

    snap_uid = adm.snapshot("docs", str(tmp_path / "snap"))
    assert adm.wait_for_task(snap_uid)["details"]["files"] > 0

    # task history is queryable the Meilisearch way
    types = [t["type"] for t in adm.tasks(index_uids=["docs"])]
    assert types[0] == "snapshotCreation"
    assert "indexCreation" in types


def test_admin_reindex_swaps_live(admin_env, tmp_path):
    root, out, adm = admin_env
    uid = adm.reindex("docs", str(tmp_path / "re"), CFG, force=True)
    rec = adm.wait_for_task(uid)
    assert rec["details"].get("swapped") is True
    # the registry now serves the rebuilt dir under the same name
    reg = json.load(open(os.path.join(root, "registry.json")))["indexes"]
    assert reg["docs"] == str(tmp_path / "re")


# --------------------------------------------------------------- stats

def test_index_stats_counts_and_flags(admin_env):
    root, out, adm = admin_env
    st = index_stats(out)
    meta = json.load(open(os.path.join(out, "meta.json")))
    # delete test above tombstoned one doc (module-scoped fixture order is
    # alphabetical-stable within the file: mutations ran first)
    assert st["numberOfDocuments"] == meta["n_docs"] - st["tombstones"]
    fd = st["fieldDistribution"]
    assert fd["url"] == meta["n_docs"]
    assert 0 < fd["title"] <= fd["url"]
    assert st["isIndexing"] is False
    inst = adm.all_stats()
    assert inst["databaseSize"] > 0
    assert "docs" in inst["indexes"]
