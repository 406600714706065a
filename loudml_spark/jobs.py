"""Async job registry — the reference's job machinery as threads.

The reference queues work in pebble process pools with a
waiting→running→done/failed/canceled state machine polled over a
queue (loudml/server.py:263-446).  Spark actions already execute on
the cluster; what the API layer needs is the *bookkeeping*: submit a
callable, poll its state, fetch the result, cancel.  Threads (not
processes) are correct here because the heavy lifting happens in the
JVM — the GIL only serializes plan construction.

Spark-specific niceties: each job gets a job group so ``cancel``
propagates to running Spark stages
(``spark.sparkContext.cancelJobGroup``), and a FAIR-scheduler POOL by
job type — the reference isolates training in a nice-d dedicated
process pool (loudml/server.py:1859-1870, worker.py:49-50) so a long
fit can't starve interactive queries; Spark's equivalent is the
thread-local ``spark.scheduler.pool`` property, which each job thread
sets before its first action ("training" for train jobs, "queries"
for everything else — weights/minShare live in the cluster's
fairscheduler.xml; see SCALE.md).
"""

from __future__ import annotations

import threading
import traceback
import uuid
from typing import Any, Callable

from loudml_spark import errors

WAITING, RUNNING, DONE, FAILED, CANCELED = (
    "waiting", "running", "done", "failed", "canceled")


TRAIN_POOL = "training"
QUERY_POOL = "queries"


def pool_for(name: str) -> str:
    """Job-type → scheduler-pool mapping (train vs everything else,
    the reference's worker-pool split)."""
    return TRAIN_POOL if name.startswith("train") else QUERY_POOL


class Job:
    def __init__(self, name: str, fn: Callable[[], Any],
                 pool: str | None = None):
        self.id = str(uuid.uuid4())
        self.name = name
        self.pool = pool or pool_for(name)
        self.fn = fn
        self.state = WAITING
        self.result: Any = None
        self.error: str | None = None
        self.progress: float = 0.0
        self._done = threading.Event()

    def describe(self) -> dict:
        return {
            "id": self.id, "name": self.name, "state": self.state,
            "progress": self.progress, "error": self.error,
        }

    def wait(self, timeout: float | None = None) -> Any:
        if not self._done.wait(timeout):
            raise errors.LoudMLSparkError(f"job {self.id} timed out")
        if self.state == FAILED:
            raise errors.LoudMLSparkError(self.error)
        if self.state == CANCELED:
            raise errors.LoudMLSparkError(f"job {self.id} canceled")
        return self.result


class JobRegistry:
    # bound the registry: a periodic-eval loop submits forever, and
    # every retained Job pins its fn closure + result (often a scored
    # DataFrame).  Keep the most recent finished jobs only — the
    # reference reaps finished pool futures the same way.
    MAX_FINISHED = 1000

    def __init__(self, spark=None):
        self.spark = spark
        self._jobs: dict[str, Job] = {}
        self._lock = threading.Lock()

    def _reap_locked(self) -> None:
        done_states = (DONE, FAILED, CANCELED)
        finished = [j for j in self._jobs.values()
                    if j.state in done_states]
        excess = len(finished) - self.MAX_FINISHED
        if excess > 0:
            # dict preserves insertion order → oldest first
            for j in finished[:excess]:
                del self._jobs[j.id]

    def submit(self, name: str, fn: Callable[[], Any],
               pool: str | None = None) -> Job:
        job = Job(name, fn, pool=pool)
        with self._lock:
            self._reap_locked()
            self._jobs[job.id] = job

        def run():
            if job.state == CANCELED:
                job._done.set()
                return
            job.state = RUNNING
            if self.spark is not None:
                sc = self.spark.sparkContext
                # thread-local: only this job's actions land in the
                # pool, concurrent jobs on other threads are untouched
                sc.setLocalProperty("spark.scheduler.pool", job.pool)
                sc.setJobGroup(job.id, name, interruptOnCancel=True)
            try:
                job.result = fn()
                if job.state != CANCELED:
                    job.state = DONE
                    job.progress = 1.0
            except Exception:
                if job.state != CANCELED:
                    job.state = FAILED
                    job.error = traceback.format_exc(limit=3)
            finally:
                job._done.set()

        threading.Thread(target=run, daemon=True, name=f"job-{name}").start()
        return job

    def get(self, job_id: str) -> Job:
        job = self._jobs.get(job_id)
        if job is None:
            raise errors.LoudMLSparkError(f"unknown job: {job_id}")
        return job

    def cancel(self, job_id: str) -> None:
        job = self.get(job_id)
        if job.state in (DONE, FAILED, CANCELED):
            return
        job.state = CANCELED
        if self.spark is not None:
            self.spark.sparkContext.cancelJobGroup(job_id)

    def list_jobs(self) -> list[dict]:
        return [j.describe() for j in self._jobs.values()]
