"""Meilisearch-style async task ledger (the GET /tasks surface).

The reference drives EVERY index mutation through a task uid and polls it
to completion (`meilisearch_integration/client.py:114,158,346
_wait_for_task`; `document_processor.py:411` returns taskUid to callers) —
the task queue is the operational contract of the engine, not décor.
Statuses follow Meilisearch: enqueued -> processing -> succeeded | failed,
plus canceled for tasks canceled before completion.

Storage is ONE append-only JSONL next to the index registry; the newest
line per uid wins. A transition is a single O(line) locked append — never a
rewrite — so a crashed operation leaves its task visibly 'processing'
(the same crashed-run forensics contract as the build manifest). Appends
take an fcntl lock, so concurrent writers (two driver processes sharing a
ledger) serialize uid allocation; reads are lock-free snapshots.

Scale note: tasks are control-plane metadata (one line per OPERATION, not
per document) — a year of continuous crawling is ~1e5 lines. delete_tasks
(the Meilisearch DELETE /tasks analog) compacts the file atomically when
ops tooling wants history trimmed.
"""

from __future__ import annotations

import errno
import json
import os
import time
from contextlib import contextmanager

# Meilisearch task types (the subset this engine's operations map onto)
TASK_TYPES = (
    "documentAdditionOrUpdate",
    "documentDeletion",
    "indexCreation",
    "indexUpdate",
    "indexDeletion",
    "indexSwap",
    "settingsUpdate",
    "snapshotCreation",
    "dumpCreation",
    "taskCancelation",
    "taskDeletion",
)

_FINISHED = ("succeeded", "failed", "canceled")


def _now() -> float:
    return time.time()


class TaskFailedError(RuntimeError):
    """wait_for_task on a failed task (reference client.py:355 raises
    MeilisearchError with the task's error message)."""


class TaskLedger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    # ------------------------------------------------------------- storage

    def _append_locked(self, build_record) -> dict:
        """Append one record under an exclusive flock; build_record sees the
        current last-uid so uid allocation is race-free across processes."""
        import fcntl

        with open(self.path, "a+") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            try:
                f.seek(0)
                last = -1
                for line in f:
                    if line.strip():
                        last = max(last, json.loads(line)["uid"])
                rec = build_record(last)
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")
                f.flush()
            finally:
                fcntl.flock(f, fcntl.LOCK_UN)
        return rec

    def _snapshot(self) -> dict[int, dict]:
        """uid -> newest record (lock-free read of the append-only log)."""
        out: dict[int, dict] = {}
        try:
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        out[rec["uid"]] = rec
        except OSError as e:
            if e.errno != errno.ENOENT:
                raise
        return out

    # ----------------------------------------------------------- lifecycle

    def enqueue(self, task_type: str, index_uid: str | None = None,
                details: dict | None = None) -> int:
        if task_type not in TASK_TYPES:
            raise ValueError(f"unknown task type {task_type!r}")

        def build(last_uid: int) -> dict:
            return {
                "uid": last_uid + 1,
                "indexUid": index_uid,
                "status": "enqueued",
                "type": task_type,
                "details": details or {},
                "error": None,
                "enqueuedAt": _now(),
                "startedAt": None,
                "finishedAt": None,
            }

        return self._append_locked(build)["uid"]

    def _transition(self, uid: int, status: str, **extra) -> dict:
        def build(_last: int) -> dict:
            cur = self._snapshot().get(uid)
            if cur is None:
                raise KeyError(f"task {uid} not found")
            if cur["status"] in _FINISHED:
                raise ValueError(
                    f"task {uid} already {cur['status']}; cannot -> {status}")
            rec = dict(cur)
            rec["status"] = status
            rec.update(extra)
            return rec

        return self._append_locked(build)

    def start(self, uid: int) -> dict:
        return self._transition(uid, "processing", startedAt=_now())

    def succeed(self, uid: int, details: dict | None = None) -> dict:
        rec = self._snapshot()[uid]
        merged = {**rec.get("details", {}), **(details or {})}
        return self._transition(uid, "succeeded", finishedAt=_now(),
                                details=merged)

    def fail(self, uid: int, error: str) -> dict:
        return self._transition(
            uid, "failed", finishedAt=_now(),
            error={"message": error, "code": "internal",
                   "type": "internal"})

    def cancel_tasks(self, uids: list[int]) -> list[int]:
        """Meilisearch POST /tasks/cancel: only unfinished tasks cancel;
        finished ones are left untouched (not an error). Returns the uids
        actually canceled, and records the cancelation itself as a task."""
        canceled = []
        snap = self._snapshot()
        for uid in uids:
            rec = snap.get(uid)
            if rec is not None and rec["status"] not in _FINISHED:
                self._transition(uid, "canceled", finishedAt=_now())
                canceled.append(uid)
        done = self.enqueue("taskCancelation",
                            details={"matchedTasks": len(uids),
                                     "canceledTasks": len(canceled)})
        self.start(done)
        self.succeed(done)
        return canceled

    def delete_tasks(self, uids: list[int]) -> int:
        """Meilisearch DELETE /tasks: drop FINISHED tasks from history.
        The one compaction path — rewrites the log atomically."""
        snap = self._snapshot()
        victims = {u for u in uids
                   if u in snap and snap[u]["status"] in _FINISHED}
        if not victims:
            return 0
        import fcntl

        with open(self.path, "a+") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            try:
                f.seek(0)
                keep = [line for line in f
                        if line.strip()
                        and json.loads(line)["uid"] not in victims]
                tmp = self.path + ".tmp"
                with open(tmp, "w") as g:
                    g.writelines(keep)
                os.replace(tmp, self.path)
            finally:
                fcntl.flock(f, fcntl.LOCK_UN)
        return len(victims)

    # -------------------------------------------------------------- queries

    def get_task(self, uid: int) -> dict:
        rec = self._snapshot().get(uid)
        if rec is None:
            raise KeyError(f"task {uid} not found")
        return rec

    def tasks(self, statuses: list[str] | None = None,
              types: list[str] | None = None,
              index_uids: list[str] | None = None,
              limit: int = 20, from_uid: int | None = None) -> list[dict]:
        """GET /tasks: newest-first, keyset-paginated by uid (`from`)."""
        recs = sorted(self._snapshot().values(),
                      key=lambda r: -r["uid"])
        out = []
        for r in recs:
            if from_uid is not None and r["uid"] > from_uid:
                continue
            if statuses and r["status"] not in statuses:
                continue
            if types and r["type"] not in types:
                continue
            if index_uids and r["indexUid"] not in index_uids:
                continue
            out.append(r)
            if len(out) >= limit:
                break
        return out

    def wait_for_task(self, uid: int, timeout: float = 30.0,
                      interval: float = 0.05) -> dict:
        """Reference client.py:346 _wait_for_task: poll until succeeded
        (returned) or failed (raised); TimeoutError past the deadline."""
        deadline = time.monotonic() + timeout
        while True:
            rec = self.get_task(uid)
            if rec["status"] == "succeeded":
                return rec
            if rec["status"] == "failed":
                raise TaskFailedError(
                    f"Task {uid} failed: {rec['error']['message']}")
            if rec["status"] == "canceled":
                return rec
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"Task {uid} did not complete within {timeout} seconds")
            time.sleep(interval)


@contextmanager
def tracked(ledger: TaskLedger | None, task_type: str,
            index_uid: str | None = None, details: dict | None = None):
    """Run one engine operation as a ledger task: enqueue+start on entry,
    succeeded on clean exit, failed (with the exception message) on raise —
    the exception propagates. With ledger=None this is a no-op shim so call
    sites stay unconditional. Yields a dict whose 'uid' is the task uid and
    whose 'details' may be mutated by the body (merged into the final
    record)."""
    if ledger is None:
        yield {"uid": None, "details": {}}
        return
    uid = ledger.enqueue(task_type, index_uid, details)
    ledger.start(uid)
    ctx = {"uid": uid, "details": {}}
    try:
        yield ctx
    except BaseException as e:
        ledger.fail(uid, f"{type(e).__name__}: {e}")
        raise
    ledger.succeed(uid, ctx["details"])
