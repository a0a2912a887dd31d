"""Partitioned-serving A/B: is the one-box N->4N serving envelope a
single-JVM property or a host-DRAM property?

Same 16 cores, same box, same prebuilt index, same query workload:

  A) one ``local[16]`` JVM serving a query batch           (the 4N shape)
  B) four CONCURRENT ``local[4]`` JVMs, each its own heap, GC, page-
     cache mappings and Python workers, each serving the same batch
     (the 4-executor shape a real cluster runs — minus private DRAM)

If B's aggregate q/s beats A, the measured ~0.62 serve-only efficiency
(BENCH.md round-5 final) is in-JVM contention that a multi-executor
deployment does not pay; if B ~= A, the envelope is host DRAM and the
honest floor stands as stated.  Pairs run interleaved (A,B,A,B,...) in
one window like every other scaling measurement this round.

    python tools/partitioned_serve_ab.py            # 2 pairs, 8000 q/JVM
    AB_PAIRS=3 AB_QUERIES=8000 AB_IDX=/tmp/wtf_serve480k \
        python tools/partitioned_serve_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = "/tmp/wtf_spark_pkg.zip"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_zip() -> None:
    if os.path.exists(ZIP):
        os.remove(ZIP)
    subprocess.run(
        ["zip", "-qr", ZIP, "wikitfidf_spark", "-x", "*__pycache__*"],
        cwd=REPO, check=True,
    )


def submit_cmd(cores: int, idx: str, queries: int) -> list[str]:
    return [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.host=127.0.0.1",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.driver.memory=8g",
        "--py-files", ZIP,
        os.path.join(REPO, "tools", "submit_job.py"),
        "--docs", "480000", "--queries", str(queries),
        "--index-dir", idx, "--reuse-index",
    ]


def parse_result(stdout: str) -> dict:
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def run_single(cores: int, idx: str, queries: int) -> dict:
    out = subprocess.run(submit_cmd(cores, idx, queries),
                         cwd=REPO, capture_output=True, text=True)
    if out.returncode != 0:
        log("\n".join(out.stderr.splitlines()[-20:]))
        raise RuntimeError(f"local[{cores}] failed")
    return parse_result(out.stdout)


def run_concurrent(n_jvms: int, cores_each: int, idx: str, queries: int) -> dict:
    """Launch n_jvms spark-submits simultaneously; aggregate throughput
    uses the LAST process's finish (wall covers every query of every
    JVM, startup included — conservative against B) and, separately,
    the per-JVM in-query q/s sum (startup excluded — the overlapped
    query windows are near-coincident because startup is uniform)."""
    t0 = time.time()
    procs = [
        subprocess.Popen(submit_cmd(cores_each, idx, queries), cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                         text=True)
        for _ in range(n_jvms)
    ]
    results = []
    for p in procs:
        stdout, _ = p.communicate()
        if p.returncode != 0:
            raise RuntimeError("concurrent local JVM failed")
        results.append(parse_result(stdout))
    wall = time.time() - t0
    return {
        "n_jvms": n_jvms,
        "cores_each": cores_each,
        "queries_per_jvm": queries,
        "wall_sec_incl_startup": round(wall, 2),
        "agg_qps_incl_startup": round(n_jvms * queries / wall, 2),
        "per_jvm_query_sec": [r["query_sec"] for r in results],
        "per_jvm_qps": [r["qps"] for r in results],
        "agg_qps_in_query": round(sum(r["qps"] for r in results), 2),
    }


def main() -> None:
    idx = os.environ.get("AB_IDX", "/tmp/wtf_serve480k")
    queries = int(os.environ.get("AB_QUERIES", "8000"))
    pairs = int(os.environ.get("AB_PAIRS", "2"))
    build_zip()
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        log(f"prebuilding index at {idx} (local[16], 480k docs)")
        # drop the trailing --reuse-index: this run builds
        subprocess.run(submit_cmd(16, idx, 4)[:-1], cwd=REPO, check=True)

    out = {"metric": "partitioned_serve_ab", "index": idx,
           "queries_per_jvm": queries, "pairs": []}
    for i in range(pairs):
        a = run_single(16, idx, queries)
        b = run_concurrent(4, 4, idx, queries)
        pair = {
            "pair": i,
            "A_local16_qps": a["qps"],
            "A_query_sec": a["query_sec"],
            "B_4x_local4": b,
            "B_over_A_in_query": round(b["agg_qps_in_query"] / a["qps"], 3),
            "B_over_A_incl_startup": round(
                b["agg_qps_incl_startup"] / a["qps"], 3),
        }
        out["pairs"].append(pair)
        log(f"pair {i}: A(local[16]) {a['qps']} q/s | "
            f"B(4x local[4]) {b['agg_qps_in_query']} q/s in-query, "
            f"{b['agg_qps_incl_startup']} q/s incl startup | "
            f"B/A {pair['B_over_A_in_query']}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
