"""Two-parallelism scaling evidence (BASELINE.md sandbox protocol).

No real cluster is available, so the north rule's N -> 4N executor scaling
criterion is evidenced by running the IDENTICAL extraction job on the
IDENTICAL deterministic synthetic corpus at local[8] (N) and local[32] (4N),
each in a fresh subprocess (fresh JVM), and reporting docs/sec plus
efficiency = (docs_per_sec_4N / docs_per_sec_N) / 4  (target >= 0.8).

Each level is CPU-pinned with `taskset` to exactly its core count —
otherwise local[8]'s python workers, JVM shuffle/GC threads, and Arrow
serialization silently spill onto the other 24 machine cores and the
comparison flatters the small level (an 8-executor cluster node does NOT
get free extra cores). 3 measured runs per level, best-of reported, after
one warmup run.

Usage: python bench_scaling.py [n_docs]   # default 300000
Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from textractssmlprocessor_spark.session import get_spark
from textractssmlprocessor_spark.corpus import synthesize_pages
from textractssmlprocessor_spark.operators.extract import extract_chunks

cores = {cores}
n_docs = {n_docs}
spark = get_spark(app_name=f"scaling-{{cores}}", cores=cores,
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

pages = synthesize_pages(spark, n_docs).cache()
assert pages.count() == n_docs  # materialize input before timing

def run():
    extract_chunks(pages, num_partitions=cores * 4) \
        .write.format("noop").mode("overwrite").save()

run()  # warmup: python workers + JIT + Arrow buffers
best = None
for _ in range(3):
    t0 = time.time()
    run()
    elapsed = time.time() - t0
    best = elapsed if best is None or elapsed < best else best
print(json.dumps({{"cores": cores, "n_docs": n_docs, "sec": round(best, 3),
                   "docs_per_sec": round(n_docs / best, 2)}}))
spark.stop()
"""


def run_level(cores: int, n_docs: int) -> dict:
    code = _WORKER.format(repo=REPO, cores=cores, n_docs=n_docs)
    cmd = [sys.executable, "-c", code]
    if os.path.exists("/usr/bin/taskset"):
        # pin the whole process tree (JVM + python workers) to `cores` CPUs
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.strip().splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cores={cores}: {out.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    lo = run_level(8, n_docs)
    hi = run_level(32, n_docs)
    eff = round(hi["docs_per_sec"] / lo["docs_per_sec"] / 4, 3)
    summary = {"local8": lo, "local32": hi, "scaling_efficiency": eff}
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-parallelism scaling evidence

Protocol (BASELINE.md): identical extraction job (pages -> chunks+SSML,
`extract_chunks`) on an identical deterministic synthetic corpus
(`corpus.synthesize_pages`, {n_docs} docs, 1% skew tail at 64x length on one
host), run at two parallelism levels in fresh JVMs, each CPU-pinned via
`taskset` to exactly its core count (so local[8] cannot borrow the other 24
machine cores for python workers / JVM threads — the honest 8-core-node
simulation). Timing excludes SparkSession startup and input materialization;
one warmup pass precedes 3 measured passes, best-of-3 reported.

| level | cores | docs | wall sec | docs/sec |
|---|---|---|---|---|
| N  | 8  | {lo['n_docs']} | {lo['sec']} | {lo['docs_per_sec']} |
| 4N | 32 | {hi['n_docs']} | {hi['sec']} | {hi['docs_per_sec']} |

**Scaling efficiency** = ({hi['docs_per_sec']} / {lo['docs_per_sec']}) / 4 =
**{eff}** (target >= 0.8).

Config: Arrow enabled, `spark.sql.execution.arrow.maxRecordsPerBatch=512`,
`spark.sql.shuffle.partitions` = cores, salted repartition on
`xxhash64(url)` into 2x-cores partitions, AQE on.

Correctness gate for this run: `python -m pytest -x -q` (per-url byte
identity of extracted_text/ssml vs the single-process oracle).
"""
        )


if __name__ == "__main__":
    main()
