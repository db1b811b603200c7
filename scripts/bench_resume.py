"""Driver-kill checkpoint-resume proof for the full ``build_kg`` suite.

Companion to ``bench_fault.py`` (which proves WORKER death is absorbed by
Ray's lineage retry inside a stage): this script proves DRIVER/node death
is absorbed ACROSS stages by the per-partition checkpoint manifests
(``state/checkpoint.py``) — the layer a 256-node cluster needs when a whole
job dies (spot preemption, head-node loss, OOM of the driver).

Protocol: SIGKILL the entire process group of a mid-flight ``build_kg``
run (driver + raylet + GCS + workers — the moral equivalent of the node
dying), then re-run the SAME command over the surviving output directory.
Claims under test:

- stages whose ``_MANIFEST.json`` was written before the kill are SKIPPED
  on resume (fingerprint-matched), not recomputed;
- the half-written stage (a ``.tmp`` dir with partial parquet) is discarded
  and rebuilt — the rename-after-write discipline means a completed dir is
  never half-full;
- the resumed output is byte-identical to an uninterrupted clean run
  (order-independent DuckDB content hash per table).

Usage: python scripts/bench_resume.py [n_rows]   (default 2,000,000)
"""

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_fault import _table_hash  # noqa: E402

N_ROWS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
          else 2_000_000)
CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_fault.py")
TABLES = ["messages", "triples", "nodes", "edges", "scorecard"]


def _run_child(corpus_dir: str, out_dir: str, mode: str = "fresh",
               kill_after: float | None = None) -> dict | None:
    """Run one build_kg child; if kill_after is set, SIGKILL its whole
    process group at that offset and return None."""
    proc = subprocess.Popen(
        [sys.executable, CHILD, "--child", corpus_dir, out_dir, mode],
        stdout=subprocess.PIPE, text=True, start_new_session=True)
    if kill_after is not None:
        deadline = time.time() + kill_after
        while time.time() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"child finished in <{kill_after}s — kill too late to "
                    "interrupt; lower the kill fraction")
            time.sleep(0.2)
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        # give orphaned ray daemons a moment to notice and exit
        time.sleep(3.0)
        return None
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"child failed rc={proc.returncode}")
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    corpus_dir = subprocess.run(
        [sys.executable, CHILD, "--prep", str(N_ROWS)], capture_output=True,
        text=True, check=True).stdout.strip().splitlines()[-1]

    out_clean = f"/tmp/bench_resume_clean_{N_ROWS}"
    out_res = f"/tmp/bench_resume_kill_{N_ROWS}"

    clean = _run_child(corpus_dir, out_clean)

    # fresh attempt, killed at ~60% of the clean wall (after the messages
    # boundary normally completes, mid later stages)
    import shutil

    shutil.rmtree(out_res, ignore_errors=True)
    _run_child(corpus_dir, out_res, "fresh",
               kill_after=clean["wall_sec"] * 0.6)
    survived = {t: os.path.exists(f"{out_res}/{t}/_MANIFEST.json")
                for t in TABLES if t != "scorecard"}
    tmp_dirs = [d for d in os.listdir(out_res) if d.endswith(".tmp")] \
        if os.path.isdir(out_res) else []

    resumed = _run_child(corpus_dir, out_res, "resume")

    import duckdb

    con = duckdb.connect()
    tables, all_match = {}, True
    for t in TABLES:
        hc = _table_hash(con, f"{out_clean}/{t}")
        hr = _table_hash(con, f"{out_res}/{t}")
        match = hc == hr
        all_match &= match
        tables[t] = {"clean": hc, "resumed": hr, "match": match}

    skipped = {k: v.get("skipped") for k, v in resumed["datasets"].items()}
    print(json.dumps({
        "metric": "build_kg_driver_kill_resume",
        "n_rows": N_ROWS,
        "clean_wall_sec": clean["wall_sec"],
        "killed_at_sec": round(clean["wall_sec"] * 0.6, 2),
        "manifests_present_after_kill": survived,
        "tmp_dirs_after_kill": tmp_dirs,
        "resume_wall_sec": resumed["wall_sec"],
        "resume_skipped": skipped,
        "resume_vs_clean_wall": round(
            resumed["wall_sec"] / clean["wall_sec"], 3),
        "all_tables_match": all_match,
        "tables": tables,
    }))
    sys.exit(0 if (all_match and any(survived.values())
                   and any(skipped.values())) else 1)


if __name__ == "__main__":
    main()
