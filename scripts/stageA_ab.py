"""Stage-A scaling A/B harness (VERDICT r4 #1): run the pipeline-only
bench at local[8] and local[32] under candidate configs, interleaved,
and report per-stage times + GC so the JVM-stage scaling gap can be
attributed.

Each draw is a clean spark-submit (same protocol as scaling_bench.py).
Configs are tried round-robin so machine drift hits them evenly.

Usage: python scripts/stageA_ab.py [rounds=2] [config ...]
       (no config args = the standard candidate set)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CONFIGS: dict[str, dict] = {
    "baseline": {},
    "parts128": {"shuffle_parts": 128},
    "parts256": {"shuffle_parts": 256},
    "nocompress": {"conf": {"spark.shuffle.compress": "false",
                            "spark.shuffle.spill.compress": "false"}},
    "parallelgc": {"java": "-XX:+UseParallelGC"},
    "g1pause": {"java": "-XX:MaxGCPauseMillis=400 -XX:+ParallelRefProcEnabled"},
    # plan variants (bench.py SPARK_GRAFT_PIPE_VARIANT, continuation
    # session). The new default job = shuffled-hinted joins + salted
    # spread + slim log; tokens below restore prior shapes for A/B:
    "wide": {"variant": "wide"},          # pre-continuation log columns
    "spread": {"variant": "spread"},      # explicit phase-1 salt exchange
    "saltjoin": {"variant": "saltjoin"},  # (host,salt)-keyed gate+cut
    "default": {"variant": ""},           # hinted SHJ + window-reuse + slim
    "minby": {"variant": "minby"},        # SortAggregate admission shape
}


def run(cpus: int, cfg: dict) -> dict:
    env = os.environ.copy()
    env["SPARK_GRAFT_SF_DIR"] = SF_DIR
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_ONLY"] = "pipeline"
    if "shuffle_parts" in cfg:
        env["SPARK_GRAFT_SHUFFLE_PARTS"] = str(cfg["shuffle_parts"])
    if "conf" in cfg:
        env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(cfg["conf"])
    if "variant" in cfg:
        env["SPARK_GRAFT_PIPE_VARIANT"] = cfg["variant"]
    from cola_spark.shipping import build_pyfiles_zip

    zip_path = build_pyfiles_zip(os.path.join(REPO, "BENCH", "engine.zip"))
    spark_submit = shutil.which("spark-submit")
    cmd = [
        spark_submit, "--master", f"local[{cpus}]", "--py-files", zip_path,
        "--driver-memory", "24g",
        "--conf", "spark.ui.enabled=false",
    ]
    if "java" in cfg:
        cmd += ["--conf", f"spark.driver.extraJavaOptions={cfg['java']}"]
    cmd += [os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=REPO)
    for line in reversed(out.stdout.splitlines()):
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise RuntimeError(f"no JSON cpus={cpus} cfg={cfg}:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main() -> None:
    sys.path.insert(0, REPO)
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:] or list(CONFIGS)
    results: dict[str, dict[int, list[dict]]] = {n: {8: [], 32: []} for n in names}
    for _ in range(rounds):
        for name in names:
            for cpus in (8, 32):
                r = run(cpus, CONFIGS[name])
                q = r["queries"]
                rec = {
                    "thr": r["pipeline_urls_per_sec"],
                    "jvm": q["frontier_jvm_stage"], "py": q["frontier_py_stage"],
                    "jvm_gc": r.get("jvm_gc_secs"), "py_gc": r.get("py_gc_secs"),
                }
                results[name][cpus].append(rec)
                print(f"DRAW {name} local[{cpus}]: {json.dumps(rec)}", flush=True)
    print("\n=== best-of per config ===")
    for name in names:
        b8 = max(results[name][8], key=lambda r: r["thr"])
        b32 = max(results[name][32], key=lambda r: r["thr"])
        eff = (b32["thr"] / b8["thr"]) / 4
        jvm_x = b8["jvm"] / b32["jvm"]
        py_x = b8["py"] / b32["py"]
        print(f"{name}: eff={eff:.3f} thr8={b8['thr']:.0f} thr32={b32['thr']:.0f} "
              f"jvm {b8['jvm']:.2f}->{b32['jvm']:.2f} ({jvm_x:.2f}x, gc {b8['jvm_gc']}->{b32['jvm_gc']}) "
              f"py {b8['py']:.2f}->{b32['py']:.2f} ({py_x:.2f}x)")
    print(json.dumps({n: results[n] for n in names}))


if __name__ == "__main__":
    main()
