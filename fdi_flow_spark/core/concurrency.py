"""Driver-side overlap of independent artifact-build jobs.

Composed fit+score plans (curation_scored / curation_deploy, the DSIR and
NB fits) materialize several SMALL offline artifacts with eager
``localCheckpoint()`` before the scoring plan is even built: each fit is
its own Spark job over a corpus slice, and issuing them sequentially from
the driver leaves most cores idle through every job's tail. Spark's
scheduler happily runs several jobs at once inside one application —
actions are only sequential because driver code calls them sequentially —
so submitting independent builds from a small thread pool lets the next
job's tasks back-fill executors freed by the current job's stragglers.

Python threads map to distinct JVM threads under PySpark's pinned-thread
mode (the default since 3.2), so concurrent job submission is safe; jobs
are scheduled FIFO, which is exactly the back-fill behaviour wanted here.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

# 2-4 jobs in flight is plenty: enough to fill a small fit job's tail,
# not so many that independent scans fight for executor cores.
_MAX_CONCURRENT_BUILDS = 4


def build_concurrently(*thunks: Callable[[], Any]) -> tuple:
    """Run independent driver-side build thunks concurrently and return
    their results in ``thunks`` order. Each thunk typically triggers one
    or two eager ``localCheckpoint`` jobs (a model fit, a digest table);
    the thunks MUST be independent — a thunk that consumes another
    thunk's result belongs in the same thunk, sequenced after it.
    Exceptions propagate to the caller unchanged.

    Thread-local JVM properties (job group/description, scheduler pool)
    set on the CALLING thread are not inherited by plain pool threads
    under PySpark's pinned-thread mode (the default since 3.2), so each
    thunk is wrapped with ``pyspark.inheritable_thread_target`` — the
    documented way to propagate them — when a SparkContext is live (r14
    ADVICE). Without it a ``cancelJobGroup`` aimed at the calling
    thread's group would miss (or, with pinning disabled, hit) the
    concurrent build jobs. With no active context (unit tests of the
    pool itself) the thunks run unwrapped."""
    if len(thunks) == 1:
        return (thunks[0](),)
    try:
        from pyspark import SparkContext, inheritable_thread_target
        from pyspark.sql import SparkSession

        if SparkContext._active_spark_context is not None:
            # pass the live session so job TAGS propagate too (the
            # function-only form warns and skips tag inheritance)
            session = SparkSession.getActiveSession()
            wrap = (
                inheritable_thread_target(session)
                if session is not None
                else inheritable_thread_target
            )
            thunks = tuple(wrap(t) for t in thunks)
    except Exception:
        pass  # no live classic context; nothing to inherit
    with ThreadPoolExecutor(
        max_workers=min(_MAX_CONCURRENT_BUILDS, len(thunks))
    ) as pool:
        futures = [pool.submit(t) for t in thunks]
        return tuple(f.result() for f in futures)
