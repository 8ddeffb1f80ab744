"""IndexAdmin — the Meilisearch client surface over this engine's index
operations: every mutation records a ledger task and returns its uid
(reference `meilisearch_integration/client.py:114-346`: add_documents /
update_settings / delete_index all return taskUid and are polled through
_wait_for_task). Operations execute synchronously here (there is no server
process), but the task RECORD lifecycle — enqueued -> processing ->
succeeded|failed with details and error payloads — matches, so callers
written against the reference's poll loop port directly.

Index names resolve through the atomic registry (maintenance.registry_*),
so admin calls compose with swap_indexes' zero-downtime reindex flow.
"""

from __future__ import annotations

import os

from ..config import EngineConfig
from ..state.tasks import TaskLedger, tracked
from . import incremental, maintenance


class IndexAdmin:
    def __init__(self, registry_path: str, ledger_path: str | None = None):
        self.registry_path = registry_path
        base = os.path.dirname(os.path.abspath(registry_path))
        self.ledger = TaskLedger(ledger_path
                                 or os.path.join(base, "tasks.jsonl"))

    # ------------------------------------------------------------- helpers

    def _dir(self, name: str) -> str:
        return maintenance.resolve_index(self.registry_path, name)

    def wait_for_task(self, uid: int, timeout: float = 30.0) -> dict:
        return self.ledger.wait_for_task(uid, timeout=timeout)

    def get_task(self, uid: int) -> dict:
        return self.ledger.get_task(uid)

    def tasks(self, **kwargs) -> list[dict]:
        return self.ledger.tasks(**kwargs)

    # ----------------------------------------------------------- mutations

    def create_index(self, name: str, index_dir: str) -> int:
        """Register a built index directory under a name (indexCreation)."""
        with tracked(self.ledger, "indexCreation", name,
                     {"indexDir": index_dir}) as t:
            if not os.path.isfile(os.path.join(index_dir, "meta.json")):
                raise FileNotFoundError(
                    f"{index_dir} is not a built index (no meta.json)")
            maintenance.registry_set(self.registry_path, name, index_dir)
        return t["uid"]

    def add_documents(self, name: str, pages_path: str, *,
                      config: EngineConfig | None = None,
                      batch_size: int = 256) -> int:
        with tracked(self.ledger, "documentAdditionOrUpdate", name) as t:
            gen = incremental.add_documents(
                self._dir(name), pages_path,
                config=config, batch_size=batch_size)
            t["details"]["generation"] = gen
        return t["uid"]

    def delete_documents(self, name: str, doc_ids: list[int]) -> int:
        with tracked(self.ledger, "documentDeletion", name,
                     {"providedIds": len(doc_ids)}) as t:
            n = maintenance.delete_docs(self._dir(name), doc_ids)
            t["details"]["deletedDocuments"] = n
        return t["uid"]

    def swap_indexes(self, pairs: list[tuple[str, str]]) -> int:
        with tracked(self.ledger, "indexSwap",
                     details={"swaps": [list(p) for p in pairs]}) as t:
            maintenance.swap_indexes(self.registry_path, pairs)
        return t["uid"]

    def snapshot(self, name: str, dest_dir: str) -> int:
        with tracked(self.ledger, "snapshotCreation", name,
                     {"dest": dest_dir}) as t:
            manifest = maintenance.snapshot(self._dir(name), dest_dir)
            t["details"]["files"] = len(manifest["files"])
        return t["uid"]

    def reindex(self, name: str, out_dir: str,
                config: EngineConfig | None = None, *,
                num_salts: int = 1, force: bool = False,
                swap: bool = True) -> int:
        """Rebuild under a staging dir and (by default) swap it live in the
        same task — the zero-downtime flow the registry exists for."""
        with tracked(self.ledger, "indexUpdate", name,
                     {"outDir": out_dir}) as t:
            meta = maintenance.reindex(self._dir(name), out_dir, config,
                                       num_salts=num_salts, force=force)
            if meta is None:
                t["details"]["upToDate"] = True
            elif swap:
                staging = f"_staging_{name}"
                maintenance.registry_set(self.registry_path, staging,
                                         out_dir)
                maintenance.swap_indexes(self.registry_path,
                                         [(name, staging)])
                t["details"]["swapped"] = True
        return t["uid"]

    # -------------------------------------------------------------- reads

    def stats(self, name: str) -> dict:
        """GET /indexes/:idx/stats (numberOfDocuments / isIndexing /
        fieldDistribution) for one registered index."""
        return maintenance.index_stats(self._dir(name))

    def all_stats(self) -> dict:
        """GET /stats — instance-level rollup over every registered index
        (reference monitoring.py:630 consumes this shape)."""
        reg = maintenance.registry_read(self.registry_path)
        per = {name: self.stats(name) for name in sorted(reg)}
        return {
            "databaseSize": sum(
                os.path.getsize(os.path.join(r, f))
                for d in reg.values() if os.path.isdir(d)
                for r, _, fs in os.walk(d) for f in fs),
            "indexes": per,
        }

    # -------------------------------------------------------------- dumps

    def create_dump(self, dump_dir: str) -> int:
        """POST /dumps — portable export of every registered index
        (documents + settings + tombstones; shards re-derive on import)."""
        from .dumps import create_dump

        create_dump(self.registry_path, dump_dir, ledger=self.ledger)
        return self.ledger.tasks(types=["dumpCreation"], limit=1)[0]["uid"]
