"""State-bucket-count sweep for the stateful scaling margin (round-5).

The stateful path's raw N->4N scaling (0.545 raw / 0.833 normalized in
round 4) is bounded by the Python state fold's serial fraction at the
key-coalescing bucket count.  Round 5 made the count plan-time
adaptive (streaming/buckets.py: max(32*cores, keys/4096)); this tool
measures WHERE the flat region of the bucket-count/throughput curve
sits by running the identical stateful workload (scaling_worker.py
--mode stateful) at a fixed parallelism while pinning
OSPREY_WC_STATE_BUCKETS across a geometric sweep.

Writes BENCH_BUCKET_SWEEP.json at the repo root and prints a summary.

Usage: python tools/bench_bucket_sweep.py [n_convs] [cores]
Env: BENCH_BUCKET_SWEEP_LEVELS="128,256,512,1024,2048,4096"
     BENCH_SCALING_REPEATS (best-of-k per level, default 2)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import WORK, gen_input, make_pyfiles  # noqa: E402


def run_stateful(zpath: str, cores: int, buckets: int, input_dir: str, tag: str) -> dict:
    out_dir = os.path.join("/dev/shm/osprey_scaling", f"sweep_{tag}")
    cmd = [
        shutil.which("spark-submit") or "spark-submit",
        "--py-files",
        zpath,
        os.path.join(REPO, "tools", "scaling_worker.py"),
        "--master",
        f"local[{cores}]",
        "--input",
        input_dir,
        "--output",
        out_dir,
        "--mode",
        "stateful",
    ]
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env["OSPREY_WC_STATE_BUCKETS"] = str(buckets)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    shutil.rmtree(out_dir, ignore_errors=True)
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"turns_per_sec"' in line:
            return json.loads(line)
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
    raise RuntimeError(f"sweep worker buckets={buckets} produced no result line")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    levels = [
        int(x)
        for x in os.environ.get(
            "BENCH_BUCKET_SWEEP_LEVELS", "128,256,512,1024,2048,4096"
        ).split(",")
    ]
    repeats = int(os.environ.get("BENCH_SCALING_REPEATS", "2"))
    os.makedirs(WORK, exist_ok=True)
    zpath = make_pyfiles()
    input_dir = gen_input(n_convs)

    runs: dict[int, list[dict]] = {b: [] for b in levels}
    fps = set()
    for i in range(repeats):
        for b in levels:
            r = run_stateful(zpath, cores, b, input_dir, f"b{b}_r{i}")
            runs[b].append(r)
            fps.add(r.get("output_fingerprint"))
            print(
                f"  buckets={b:5d} rep={i}: {r['turns_per_sec']:.0f} turns/s",
                flush=True,
            )
    if len(fps) != 1:
        raise RuntimeError(f"output fingerprint varies with bucket count: {fps}")

    best = {b: max(rs, key=lambda r: r["turns_per_sec"]) for b, rs in runs.items()}
    peak = max(best.values(), key=lambda r: r["turns_per_sec"])
    out = {
        "workload": {
            "mode": "stateful",
            "n_convs": n_convs,
            "cores": cores,
            "input_turns": peak["rows"],
            "repeats": repeats,
        },
        "output_fingerprint": next(iter(fps)),
        "levels": {
            str(b): {
                "best_turns_per_sec": best[b]["turns_per_sec"],
                "all_turns_per_sec": [r["turns_per_sec"] for r in runs[b]],
                "relative_to_peak": round(
                    best[b]["turns_per_sec"] / peak["turns_per_sec"], 3
                ),
            }
            for b in levels
        },
        "peak_buckets": int(
            max(levels, key=lambda b: best[b]["turns_per_sec"])
        ),
    }
    with open(os.path.join(REPO, "BENCH_BUCKET_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["levels"], indent=2))
    print("peak at", out["peak_buckets"], "buckets; fingerprint", out["output_fingerprint"])


if __name__ == "__main__":
    main()
