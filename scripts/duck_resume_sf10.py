#!/usr/bin/env python
"""Resume the sf10 DuckDB oracle pass after two at-scale fatalities.

History (all disclosed in BASELINE.md round 9):
1. bench_sf10_pair.py completed the FULL Spark side (cold + steady,
   JSON line in .sf10_pair_r9.log) and 14 DuckDB oracles, then the
   KERNEL OOM-killed it at 91 GB anon RSS inside ann_topk_bruteforce's
   oracle (corpus x queries cross join, ~1.6e9 pairs of 64-dim dots).
2. A first resume with memory_limit=80GB + temp spill died again on
   ann_lsh_topk's oracle — it filled the 78 GB of free disk with spill
   and raised "No space left on device" (after six more green rows).

This version makes the pass crash-proof: EVERY remaining oracle runs
in its own subprocess under memory_limit=72GB, spill to /tmp, and
preserve_insertion_order=false (cuts DuckDB's ordered-materialization
memory on the candidate-explosion shapes), with a hard wall-clock box
(SF10_ORACLE_TIMEOUT, default 1800 s). A row that OOMs, fills the
disk, or exceeds the box is recorded as infeasible-on-host; the final
JSON reports the pair total over completed rows plus the infeasible
list so the ratio can be summed honestly both ways.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, cpu_jiffies  # noqa: E402
from ssp_spark.queries import ORACLE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scalefix/sf10")
# rows measured by the two dead runs (their log lines, kept verbatim)
DONE = {
    "word_count": 1.808, "q1_pricing_summary": 0.445, "q3_top_orders": 0.405,
    "q5_nation_revenue": 0.357, "sliding_window_counts": 0.165,
    "session_windows": 9.647, "running_user_spend": 10.484,
    "user_activity_pivot": 0.217, "top_customers_per_nation": 0.104,
    "asof_join_purchase_signup": 1.921, "dedup_jaccard_pairs": 59.455,
    "dedup_minhash_lsh": 10.753, "dedup_simhash": 7.477,
    "dedup_embedding_cosine": 1695.193,
    "lang_id": 5.32, "quality_score": 7.397, "doc_fingerprint": 21.769,
    "q6_forecast_revenue": 5.99, "q18_large_orders": 22.056,
    "stats_numeric_exact": 0.618,
}
# known candidate-explosion oracles: run LAST so every cheap row lands
DEFER = ["ann_ivf_topk_gemm", "ann_lsh_topk", "ann_topk_bruteforce"]


def run_one(name: str) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute("SET memory_limit='72GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET preserve_insertion_order=false")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    t0 = time.perf_counter()
    con.execute(ORACLE[name]).fetchall()
    print(json.dumps({"name": name, "sec": round(time.perf_counter() - t0, 3)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
        return

    timeout = int(os.environ.get("SF10_ORACLE_TIMEOUT", "1800"))
    duck: dict[str, float] = dict(DONE)
    steals: dict[str, float] = {}
    infeasible: dict[str, str] = {}
    todo = [n for n in HEADLINE if n not in DONE and n not in DEFER]
    todo += [n for n in DEFER if n in HEADLINE]
    for name in todo:
        jt0, js0 = cpu_jiffies()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            infeasible[name] = f"exceeded {timeout}s box"
            print(f"duck {name} INFEASIBLE timeout>{timeout}s", flush=True)
            continue
        jt1, js1 = cpu_jiffies()
        st = round(100.0 * (js1 - js0) / max(jt1 - jt0, 1), 1)
        sec = None
        if r.returncode == 0:
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    sec = json.loads(line)["sec"]
        if sec is None:
            tail = (r.stderr or "").strip().splitlines()
            infeasible[name] = tail[-1][:200] if tail else f"rc={r.returncode}"
            print(f"duck {name} INFEASIBLE {infeasible[name]}", flush=True)
            continue
        duck[name], steals[name] = sec, st
        print(f"duck {name} {sec} steal={st}", flush=True)

    total = round(sum(duck.values()), 3)
    # per-row provenance: DONE rows were measured by the earlier crashed
    # in-process runs (no memory_limit); everything else ran in this
    # script's per-subprocess protocol (memory_limit=72GB,
    # preserve_insertion_order=false). The mixed-protocol total is
    # disclosed in BASELINE.md; this field makes it machine-auditable.
    provenance = {
        n: ("prior-run" if n in DONE else "resumed-subprocess") for n in duck
    }
    print(json.dumps({
        "engine": "duckdb", "sf_dir": SF_DIR, "value": total,
        "queries": duck, "query_steal_pct": steals,
        "query_provenance": provenance,
        "infeasible": infeasible, "n_completed": len(duck),
    }), flush=True)


if __name__ == "__main__":
    main()
