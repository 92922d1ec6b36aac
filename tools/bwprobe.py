"""Spark-free memory-bandwidth / parallel-efficiency probe.

The round-2 scaling regressions root-caused to the box, not the job: 32
concurrent plain-Python tokenize processes ran at ~0.59 parallel
efficiency on this shared-bandwidth VM on a bad day. This probe makes
that diagnostic a first-class, repeatable measurement so every scaling
number ships with the box health observed in the SAME session:

    efficiency = t_single / t_parallel

where every process (1 vs N) performs the IDENTICAL fixed work unit
(Arrow/re2 tokenization of a deterministic synthetic code corpus — the
same kernel the index build spends its time in). 1.0 = the box delivers
N independent cores; 0.5 = concurrent processes run at half speed purely
from shared memory bandwidth/cpu contention, so a Spark job CANNOT scale
better than that on this box, whatever its plan shape.

Usage: python tools/bwprobe.py [procs] [docs_per_proc]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LINE = (
    "def ident_%05d(arg_a, arg_b):\n"
    "    return arg_a + arg_b * %d  # synthetic code line with tokens\n"
)


def _make_texts(n_docs: int):
    import pandas as pd

    texts = [
        "".join(_LINE % (i * 7 + j, j) for j in range(40)) for i in range(n_docs)
    ]
    return pd.Series(texts)


def _work(n_docs: int, reps: int, start_evt, out_q) -> None:
    from koncorde_spark.fulltext.tokenizer import tokenize_arrow

    texts = _make_texts(n_docs)
    tokenize_arrow(texts.head(8))  # warm imports/JIT outside the timed region
    start_evt.wait()
    t0 = time.time()
    for _ in range(reps):
        tokenize_arrow(texts)
    out_q.put(time.time() - t0)


def _timed_round(procs: int, docs_per_proc: int, reps: int) -> float:
    """Max per-process time for `procs` simultaneous fixed work units."""
    ctx = mp.get_context("fork")
    start_evt = ctx.Event()
    out_q = ctx.Queue()
    ps = [
        ctx.Process(target=_work, args=(docs_per_proc, reps, start_evt, out_q))
        for _ in range(procs)
    ]
    for p in ps:
        p.start()
    time.sleep(1.0)  # let every worker reach the barrier
    start_evt.set()
    times = [out_q.get(timeout=600) for _ in ps]
    for p in ps:
        p.join()
    return max(times)


def single_baseline(docs_per_proc: int = 600, reps: int = 30, rounds: int = 3) -> float:
    """Per-rep single-process baseline: min over `rounds` measurements.

    The single leg is the probe's noise-critical quantity (a stall during
    it inverts every ratio computed from it); taking the min over several
    rounds and SHARING one baseline across a whole protocol session keeps
    every window's efficiency on the same scale."""
    return min(_timed_round(1, docs_per_proc, reps) for _ in range(rounds)) / reps


def probe(
    procs: int = 32,
    docs_per_proc: int = 600,
    reps: int = 30,
    baseline: float | None = None,
) -> dict:
    """Returns {procs, t_single_rep_sec, t_parallel_rep_sec, efficiency}.

    Values are PER-REP so probes of different durations compare directly.
    The timed region is `reps` tokenizations of the same batch (~2 s
    single-process) so process startup/fork jitter cannot dominate; both
    legs are min-of-2 rounds so one noise spike cannot invert the ratio
    (a shared-tenancy VM CAN stall either leg mid-probe). Pass `baseline`
    (from single_baseline) to skip the single leg and score this window
    against the session-global baseline."""
    t1 = baseline if baseline is not None else (
        min(_timed_round(1, docs_per_proc, reps) for _ in range(2)) / reps
    )
    tp = min(_timed_round(procs, docs_per_proc, reps) for _ in range(2)) / reps
    return {
        "procs": procs,
        "t_single_rep_sec": round(t1, 4),
        "t_parallel_rep_sec": round(tp, 4),
        "efficiency": round(t1 / tp, 3) if tp else None,
    }


def read_cpu_stat() -> dict:
    """Aggregate /proc/stat cpu counters (jiffies) — steal included.

    Steal is the definitive box-health signal on a shared-tenancy VM: it
    counts time the hypervisor ran OTHER tenants while this guest had
    runnable work. Sampling it around each scaling run separates 'the job
    anti-scales' from 'the box was taken away mid-run' (round-4 found the
    32-way legs BIMODAL — 27 s or 68-96 s for identical work — with no
    job-side difference)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq",
             "steal", "guest", "guest_nice"]
    return dict(zip(names, (int(x) for x in parts[1 : len(names) + 1])))


def cpu_window(before: dict, after: dict) -> dict:
    """Steal/busy fractions for the window between two read_cpu_stat()s."""
    d = {k: after.get(k, 0) - before.get(k, 0) for k in before}
    total = sum(d.get(k, 0) for k in
                ("user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"))
    if total <= 0:
        return {"steal_frac": None, "busy_frac": None}
    busy = d["user"] + d["nice"] + d["system"] + d["irq"] + d["softirq"]
    return {
        "steal_frac": round(d["steal"] / total, 4),
        "busy_frac": round(busy / total, 4),
    }


if __name__ == "__main__":
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    print(json.dumps(probe(procs, docs, reps)))
