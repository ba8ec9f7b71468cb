"""DAG scheduler harness — the orchestration layer over the pipeline
chains (VERDICT r7 "What's missing" #3).

Reference behavior: ``Airflow Dags/lakehouse_pipeline_dag.py`` defines
five linear chains of SSH tasks with ``retries=1`` + ``retry_delay``
(line 17-18), a per-task ``cmd_timeout=1800`` (line 42), and a cron
``schedule_interval`` per DAG (line 31).  Airflow itself is environment,
not engine; what the engine owes a user is the same execution contract,
in-process and testable:

- **dependency order** — tasks declare upstream names; execution is a
  deterministic topological order (Kahn with a sorted ready set, so runs
  are reproducible regardless of registration order);
- **retries with delay** — a failing task re-runs up to ``retries``
  times before being marked ``failed``;
- **per-task timeout** — each attempt runs under a Spark job group and a
  watchdog; on timeout the job group is cancelled (the cluster stops
  doing the work — a Python thread cannot be killed, but the Spark jobs
  it drives can) and the attempt counts as a failure;
- **failure propagation** — downstream tasks of a failed task are marked
  ``upstream_failed`` and never run (Airflow's trigger_rule=all_success
  default);
- **machine-readable run report** — one :class:`TaskRun` per task.

Cron bookkeeping (the ``schedule_interval='0 0 * * *'`` part) is
:func:`cron_next` — a pure 5-field cron parser computing the next fire
time strictly after a given datetime.  It takes the reference time as an
argument (no wall-clock read), so schedules are unit-testable and
deterministic.
"""

from __future__ import annotations

import concurrent.futures as _fut
import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable

from pyspark.sql import SparkSession


@dataclass
class Task:
    name: str
    fn: Callable[[], object]
    deps: tuple[str, ...] = ()
    retries: int = 1
    retry_delay: float = 0.0
    timeout: float | None = None


@dataclass
class TaskRun:
    name: str
    status: str  # success | failed | timeout | upstream_failed
    attempts: int
    seconds: float
    result: object = None
    error: str | None = None


class DagCycleError(ValueError):
    pass


@dataclass
class Dag:
    """A named task graph with Airflow-like failure semantics."""

    name: str
    schedule: str | None = None  # 5-field cron, informational + cron_next
    tasks: dict[str, Task] = field(default_factory=dict)

    def add(
        self,
        name: str,
        fn: Callable[[], object],
        deps: tuple[str, ...] | list[str] = (),
        retries: int = 1,
        retry_delay: float = 0.0,
        timeout: float | None = None,
    ) -> "Dag":
        if name in self.tasks:
            raise ValueError(f"duplicate task {name!r}")
        self.tasks[name] = Task(
            name, fn, tuple(deps), retries, retry_delay, timeout
        )
        return self

    def topo_order(self) -> list[str]:
        """Deterministic topological order (sorted ready set); raises
        DagCycleError on cycles and ValueError on unknown deps."""
        indeg: dict[str, int] = {}
        for t in self.tasks.values():
            for d in t.deps:
                if d not in self.tasks:
                    raise ValueError(f"{t.name!r} depends on unknown {d!r}")
            indeg[t.name] = len(t.deps)
        downstream: dict[str, list[str]] = {n: [] for n in self.tasks}
        for t in self.tasks.values():
            for d in t.deps:
                downstream[d].append(t.name)
        ready = sorted(n for n, k in indeg.items() if k == 0)
        order: list[str] = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            changed = False
            for m in downstream[n]:
                indeg[m] -= 1
                if indeg[m] == 0:
                    ready.append(m)
                    changed = True
            if changed:
                ready.sort()
        if len(order) != len(self.tasks):
            raise DagCycleError(
                f"cycle among {sorted(set(self.tasks) - set(order))}"
            )
        return order

    def run(self, spark: SparkSession | None = None) -> list[TaskRun]:
        """Execute in topological order with retries / timeouts /
        upstream-failed propagation.  Sequential by design: each task is
        typically a Spark action that already parallelizes across the
        cluster, so DAG-level concurrency adds nondeterminism, not
        speed (the reference's chains are linear for the same reason)."""
        order = self.topo_order()
        runs: dict[str, TaskRun] = {}
        for name in order:
            t = self.tasks[name]
            bad = [
                d
                for d in t.deps
                if runs[d].status != "success"
            ]
            if bad:
                runs[name] = TaskRun(
                    name, "upstream_failed", 0, 0.0,
                    error=f"upstream {sorted(bad)} not successful",
                )
                continue
            runs[name] = self._run_task(t, spark)
        return [runs[n] for n in order]

    def _run_task(
        self,
        t: Task,
        spark: SparkSession | None,
    ) -> TaskRun:
        group = f"dag:{self.name}:{t.name}"

        def attempt_fn():
            if spark is not None:
                spark.sparkContext.setJobGroup(
                    group, f"{self.name}.{t.name}", interruptOnCancel=True
                )
            try:
                return t.fn()
            finally:
                if spark is not None:
                    spark.sparkContext.setJobGroup("", "")

        t0 = time.monotonic()
        last_err: str | None = None
        timed_out = False
        attempts = 0
        for attempt in range(1, t.retries + 2):
            attempts = attempt
            if attempt > 1 and t.retry_delay > 0:
                time.sleep(t.retry_delay)
            # fresh single-worker executor PER ATTEMPT (r8 ADVICE): a
            # timed-out attempt whose thread never unwinds (pure-Python
            # task, or a hung action the job-group cancel can't stop)
            # must not queue the retry — or any later task — behind it.
            pool = _fut.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix=group
            )
            fut = pool.submit(attempt_fn)
            pool.shutdown(wait=False)  # worker finishes its one item
            try:
                result = fut.result(timeout=t.timeout)
                return TaskRun(
                    t.name,
                    "success",
                    attempt,
                    round(time.monotonic() - t0, 3),
                    result=result,
                )
            except _fut.TimeoutError:
                timed_out = True
                last_err = f"timeout after {t.timeout}s"
                if spark is not None:
                    # stop the cluster-side work; the worker thread
                    # unblocks when its cancelled jobs raise
                    spark.sparkContext.cancelJobGroup(group)
                fut.cancel()
                # grace wait for the cancelled attempt to unwind; if it
                # is STILL stuck, abandon the task immediately — a
                # retry could otherwise run concurrently with the stuck
                # attempt's side effects (the thread itself cannot be
                # killed; its executor is already abandoned, so nothing
                # else ever queues behind it)
                try:
                    fut.result(timeout=30)
                except _fut.TimeoutError:
                    last_err = (
                        f"timeout after {t.timeout}s; attempt thread "
                        f"still running after 30s grace — abandoned "
                        f"(no retry: it could race the stuck attempt)"
                    )
                    break
                except Exception:  # noqa: BLE001 — already recorded
                    pass
            except Exception as e:  # noqa: BLE001 — retry loop records it
                timed_out = False
                last_err = f"{type(e).__name__}: {e}"
        return TaskRun(
            t.name,
            "timeout" if timed_out else "failed",
            attempts,
            round(time.monotonic() - t0, 3),
            error=last_err,
        )


# ---------------------------------------------------------------------------
# 5-field cron (minute hour day-of-month month day-of-week)
# ---------------------------------------------------------------------------
_FIELD_RANGES = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 6))


def _parse_field(
    spec: str, lo: int, hi: int, dow: bool = False
) -> frozenset[int]:
    """One cron field → the set of matching values.  Vixie-compatible
    (r8 ADVICE): in the day-of-week field 7 is the Sunday alias (``7``
    and ``0-7`` both include Sunday), and a bare value with a step
    (``5/15``) means the range from that value to the field max
    (``5-59/15`` in the minute field), not the single value."""
    out: set[int] = set()
    top = 7 if dow else hi  # dow accepts 7 = Sunday
    for part in spec.split(","):
        step = 1
        has_step = "/" in part
        if has_step:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"bad step in {spec!r}")
        if part == "*":
            a, b = lo, top
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = int(part)
            # Vixie: 'x/step' == 'x-max/step'; bare 'x' is just {x}
            b = top if has_step else a
        if not (lo <= a <= top and lo <= b <= top and a <= b):
            raise ValueError(f"field {spec!r} outside [{lo},{top}]")
        out.update(v % 7 if dow else v for v in range(a, b + 1, step))
    return frozenset(out)


def cron_next(expr: str, after: datetime) -> datetime:
    """Next fire time STRICTLY after ``after`` for a 5-field cron
    expression (standard semantics: day-of-month and day-of-week are
    OR-ed when both are restricted, AND-ed with everything else).
    Pure function of its arguments — no wall clock — searching at most
    4 years ahead (covers Feb-29 schedules)."""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"need 5 cron fields, got {expr!r}")
    mins, hrs, dom, mon, dow = (
        _parse_field(f, lo, hi, dow=(i == 4))
        for i, (f, (lo, hi)) in enumerate(zip(fields, _FIELD_RANGES))
    )
    dom_star = fields[2] == "*"
    dow_star = fields[4] == "*"
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    limit = after + timedelta(days=4 * 366)
    while t <= limit:
        if t.month not in mon:
            # jump to the 1st of the next month
            t = (t.replace(day=1, hour=0, minute=0) + timedelta(days=32)).replace(day=1)
            continue
        cron_dow = t.weekday() + 1 if t.weekday() < 6 else 0  # Mon=1..Sun=0
        day_ok = (
            (t.day in dom or dom_star) and (cron_dow in dow or dow_star)
            if dom_star or dow_star
            else (t.day in dom or cron_dow in dow)
        )
        if not day_ok:
            t = t.replace(hour=0, minute=0) + timedelta(days=1)
            continue
        if t.hour not in hrs:
            t = t.replace(minute=0) + timedelta(hours=1)
            continue
        if t.minute not in mins:
            t += timedelta(minutes=1)
            continue
        return t
    raise ValueError(f"no fire time within 4 years for {expr!r}")
