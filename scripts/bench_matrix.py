"""Machine-readable perf matrix: bench.py across the supported configs.

Each config runs in a FRESH subprocess (one-variant-per-process: sharing a
process lets the first variant's compiled programs and allocator state skew
the later ones — see PERF.md's measurement-methodology notes), sharing the
persistent compilation cache. Output: one JSON file (default
BENCH_MATRIX.json at the repo root) with every config's bench line plus env
metadata — the regenerable artifact version of PERF.md's headline numbers.

Run: python scripts/bench_matrix.py [out.json]
"""
import json
import os
import platform
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (name, env overrides)
    ("ddim50_bf16_b8", {}),                                   # headline
    ("ddim50_bf16_b8_int8vae", {"BENCH_INT8": "1"}),
    ("dpm10_bf16_b8", {"BENCH_SAMPLER": "dpm", "BENCH_STEPS": "10"}),
    # the max-throughput combination: fast sampler + int8 frozen VAE
    ("dpm10_int8vae_b8", {"BENCH_SAMPLER": "dpm", "BENCH_STEPS": "10",
                          "BENCH_INT8": "1"}),
    ("dpm15_bf16_b8", {"BENCH_SAMPLER": "dpm", "BENCH_STEPS": "15"}),
    ("ddim50_f32_b4", {"BENCH_DTYPE": "float32", "BENCH_BATCH": "4"}),
    ("train_bf16_b2_128", {"BENCH_MODE": "train"}),
    # full-scale training rows (published 256^2x11 geometry, B=2): the
    # PERF.md full-scale table regenerated rather than transcribed
    ("train_full_256_b2", {"BENCH_MODE": "train", "BENCH_TRAIN_HW": "256",
                           "BENCH_BATCH": "2"}),
    ("train_full_256_b2_physics", {"BENCH_MODE": "train",
                                   "BENCH_TRAIN_HW": "256",
                                   "BENCH_BATCH": "2",
                                   "BENCH_TRAIN_PHYSICS": "1"}),
    # --cache-latents pure-UNet step (frozen-VAE latents device-resident):
    # what every epoch costs after the one-time encode pass
    ("train_cached_256_b2", {"BENCH_MODE": "train_cached",
                             "BENCH_TRAIN_HW": "256", "BENCH_BATCH": "2"}),
    # stage-1 / stage-2 VAE grad steps at published scale (PERF.md
    # full-scale rows, regenerable)
    ("train_vae1_256_b1", {"BENCH_MODE": "train_vae1"}),
    ("train_vae2_256_b1", {"BENCH_MODE": "train_vae2"}),
]


def main(out_path=None):
    out_path = out_path or os.path.join(REPO, "BENCH_MATRIX.json")
    env_base = dict(os.environ)
    # bench.py config.update()s this into effect in each child (the env
    # var alone is ignored here — utils/compile_cache.py)
    env_base.setdefault("JAX_COMPILATION_CACHE_DIR",
                        os.path.join(REPO, ".jax_cache"))

    results = []
    for name, overrides in CONFIGS:
        env = dict(env_base)
        env.update(overrides)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO, env=env, capture_output=True, text=True)
        wall = round(time.time() - t0, 1)
        line = None
        for out_line in reversed(proc.stdout.strip().splitlines()):
            try:
                parsed = json.loads(out_line)
            except ValueError:
                continue
            if isinstance(parsed, dict):  # bare scalars parse too — skip them
                line = parsed
                break
        entry = {"config": name, "env": overrides, "wall_s": wall,
                 "rc": proc.returncode, **(line or {})}
        if proc.returncode != 0 or line is None:
            entry["stderr_tail"] = proc.stderr.strip().splitlines()[-3:]
        results.append(entry)
        print(json.dumps(entry))

    report = {
        "generated_unix": time.time(),
        "host": platform.node(),
        "device": _device_name(),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out_path}")
    return report


def _device_name():
    try:
        import jax
        return str(jax.devices()[0])
    except Exception as e:  # the matrix itself must not die on device probing
        return f"unknown ({type(e).__name__})"


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
