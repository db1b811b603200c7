"""Worker-kill fault-tolerance proof for the full ``build_kg`` suite.

The north rule demands resumability and lineage; this script evidences the
COMPLEMENTARY recovery layer Ray provides underneath the checkpoint
manifests: task/actor lineage reconstruction.  On a 256-node cluster
running hours-long jobs, worker processes WILL die (OOM killer, preemption,
hardware); the claim under test is that the pipeline completes and produces
BYTE-IDENTICAL results when workers are SIGKILLed mid-run, because

- task-pool stages (map_batches over functions) are retried from lineage
  (Ray re-executes the lost block's task; ``max_retries`` defaults on),
- actor-pool stages restart (Ray Data pins ``max_restarts=-1`` /
  ``max_task_retries=-1`` on its actor pools —
  ``actor_pool_map_operator.py`` in ray 2.49), and
- write tasks name output files deterministically per task index, so a
  retried write overwrites its own partial file rather than duplicating
  rows (verified here by order-independent content hashes, which WOULD
  catch duplicate or lost rows).

Protocol: one clean run and one fault-injected run of the identical
pipeline over the identical corpus in fresh processes; during the fault
run, at ~35% and ~65% of the clean run's wall time, SIGKILL ``kills_per_
wave`` live non-idle ``ray::`` worker processes.  Then compare every output
table (messages / triples / nodes / edges / scorecard) by row count and an
order-independent DuckDB content hash.

Usage: python scripts/bench_fault.py [n_rows]   (default 2,000,000)
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = (int(sys.argv[2]) if sys.argv[1:2] in (["--prep"], ["--actor"])
          and len(sys.argv) > 2 and sys.argv[2].isdigit()
          else int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
          else 2_000_000)
KILLS_PER_WAVE = int(os.environ.get("FAULT_KILLS_PER_WAVE", "2"))


def _ppid(pid: int) -> int:
    with open(f"/proc/{pid}/stat") as f:
        # field 4 is ppid; field 2 (comm) may contain spaces but is
        # parenthesized — split after the closing paren
        return int(f.read().rsplit(")", 1)[1].split()[1])


def _is_descendant(pid: int, ancestor: int) -> bool:
    try:
        while pid > 1:
            if pid == ancestor:
                return True
            pid = _ppid(pid)
    except OSError:
        pass
    return False


def _live_task_workers(session_root: int) -> list[tuple[int, str]]:
    """(pid, task name) of ray workers currently EXECUTING a task, limited
    to the Ray session rooted at ``session_root`` (the child driver) — other
    Ray sessions may be live on the box (e.g. a concurrent test run) and
    must not be shot.

    Ray retitles a worker process ``ray::<TaskName>`` while it runs a task
    and ``ray::IDLE`` between tasks — killing an idle worker proves
    nothing, so only busy ones are candidates.
    """
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if (cmd.startswith("ray::") and "IDLE" not in cmd
                and _is_descendant(int(pid), session_root)):
            out.append((int(pid), cmd.split("\x00")[0]))
    return out


def _child(corpus_dir: str, out_dir: str, resume: bool = False) -> None:
    import shutil

    import ray
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        build_kg_from_corpus)

    if not resume:
        shutil.rmtree(out_dir, ignore_errors=True)
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    t0 = time.time()
    manifest = build_kg_from_corpus(lambda: rd.read_parquet(corpus_dir),
                                    out_dir, fingerprint="fault-proof")
    print(json.dumps({"wall_sec": round(time.time() - t0, 2),
                      "datasets": manifest.get("datasets",
                                               manifest.get("stats", {}))}))
    ray.shutdown()


def _child_actor(corpus_dir: str, out_dir: str) -> None:
    """The ACTOR-POOL variant: corpus → enrich → NumpyModelTagStage (weights
    built once per actor in __init__) → parquet.  Killing these workers
    exercises Ray Data's ``max_restarts=-1`` actor recovery — a restarted
    actor re-runs __init__ (rebuilds weights) and retries the lost batch —
    rather than plain task lineage retry."""
    import shutil

    import ray
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.enrich import (
        NumpyModelTagStage, enrich_batch)

    shutil.rmtree(out_dir, ignore_errors=True)
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    t0 = time.time()
    (rd.read_parquet(corpus_dir)
     .map_batches(enrich_batch, batch_format="pyarrow")
     .map_batches(NumpyModelTagStage, batch_format="pyarrow",
                  batch_size=256, concurrency=8)
     .select_columns(["message_id", "content_sha256", "tag_tokens",
                      "tag_labels"])
     .write_parquet(out_dir))
    print(json.dumps({"wall_sec": round(time.time() - t0, 2),
                      "datasets": {}}))
    ray.shutdown()


def _prep() -> None:
    from bench import ensure_corpus

    print(ensure_corpus(N_ROWS))


def _table_hash(con, path: str) -> dict:
    """Order-independent content hash of every row in a parquet dir."""
    n, h = con.execute(
        "SELECT count(*), sum(hash(to_json(t)))::VARCHAR FROM "
        f"read_parquet('{path}/**/*.parquet', hive_partitioning=true) t"
    ).fetchone()
    return {"rows": int(n), "hash": h}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3],
               resume=len(sys.argv) > 4 and sys.argv[4] == "resume")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--child-actor":
        _child_actor(sys.argv[2], sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--prep":
        _prep()
        return

    actor_mode = "--actor" in sys.argv
    child_flag = "--child-actor" if actor_mode else "--child"
    # only busy ACTOR workers are valid victims in actor mode — the claim
    # is specifically that a stateful actor restarts and retries
    victim_filter = "NumpyModelTagStage" if actor_mode else ""

    me = os.path.abspath(__file__)
    corpus_dir = subprocess.run(
        [sys.executable, me, "--prep", str(N_ROWS)], capture_output=True,
        text=True, check=True).stdout.strip().splitlines()[-1]

    def run(out_dir: str, kill_times: list[float]) -> dict:
        kills: list[dict] = []
        proc = subprocess.Popen([sys.executable, me, child_flag, corpus_dir,
                                 out_dir], stdout=subprocess.PIPE, text=True)

        def killer() -> None:
            start = time.time()
            for t in kill_times:
                while time.time() - start < t:
                    if proc.poll() is not None:
                        return
                    time.sleep(0.25)
                victims = [(p, n) for p, n in _live_task_workers(proc.pid)
                           if victim_filter in n][:KILLS_PER_WAVE]
                for pid, name in victims:
                    try:
                        os.kill(pid, signal.SIGKILL)
                        kills.append({"t": round(time.time() - start, 1),
                                      "pid": pid, "task": name})
                    except OSError:
                        pass

        th = threading.Thread(target=killer, daemon=True)
        th.start()
        out, _ = proc.communicate()
        th.join(timeout=5)
        if proc.returncode != 0:
            raise RuntimeError(f"child failed rc={proc.returncode}")
        wall = json.loads(out.strip().splitlines()[-1])["wall_sec"]
        return {"wall_sec": wall, "kills": kills}

    tag = "actor" if actor_mode else "kg"
    clean = run(f"/tmp/bench_fault_{tag}_clean_{N_ROWS}", [])
    fault = run(f"/tmp/bench_fault_{tag}_fault_{N_ROWS}",
                [clean["wall_sec"] * 0.35, clean["wall_sec"] * 0.65])

    import duckdb

    con = duckdb.connect()
    tables = {}
    all_match = True
    compare = ([""] if actor_mode
               else ["messages", "triples", "nodes", "edges", "scorecard"])
    for t in compare:
        hc = _table_hash(con, f"/tmp/bench_fault_{tag}_clean_{N_ROWS}/{t}")
        hf = _table_hash(con, f"/tmp/bench_fault_{tag}_fault_{N_ROWS}/{t}")
        match = hc == hf
        all_match &= match
        tables[t or "tags"] = {"clean": hc, "fault": hf, "match": match}

    print(json.dumps({
        "metric": ("actor_pool_fault_tolerance" if actor_mode
                   else "build_kg_fault_tolerance"),
        "n_rows": N_ROWS,
        "clean_wall_sec": clean["wall_sec"],
        "fault_wall_sec": fault["wall_sec"],
        "slowdown": round(fault["wall_sec"] / clean["wall_sec"], 3),
        "workers_killed": fault["kills"],
        "n_killed": len(fault["kills"]),
        "all_tables_match": all_match,
        "tables": tables,
    }))
    sys.exit(0 if (all_match and fault["kills"]) else 1)


if __name__ == "__main__":
    main()
