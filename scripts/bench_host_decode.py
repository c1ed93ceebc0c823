"""Host input-pipeline throughput: JPEG decode -> canvas/eval pixels.

The streaming train loop is fed by batch_train_canvases (C++ libjpeg
pool, data/native/decoder.cpp) with a PIL fallback; on a real TPU VM
(~200 vCPUs) this stage must outrun the device step (ViT-B/32 train
consumes ~3.7k img/s/chip).  This measures per-image cost and thread
scaling for both host batch layouts, plus the single-thread PIL
fallback, on synthetic JPEGs of LAION-typical size.

CPU-only (no jax): safe to run alongside TPU jobs.  On this 1-core dev
box scaling tops out at 1 thread by construction (CLAUDE.md) — the
numbers that matter are per-image ms (divide into vCPUs for a real VM's
feed rate).

Usage: python scripts/bench_host_decode.py [--n 256] [--threads 1,2,4,8,16]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(root: str, n: int):
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        # LAION-typical mix of sizes/orientations; smooth content so the
        # files compress like photos, not noise
        h = int(rng.integers(240, 640))
        w = int(rng.integers(240, 640))
        base = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        img = Image.fromarray(base).resize((w, h), Image.BICUBIC)
        p = os.path.join(root, f"{i}.jpg")
        img.save(p, quality=90)
        paths.append(p)
    return paths


def timed(fn, reps=3):
    fn()  # warmup (thread pool spinup, page cache)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--threads", default="1,2,4,8,16")
    args = ap.parse_args()
    threads = [int(t) for t in args.threads.split(",")]

    from swat_tpu.data import native

    print(json.dumps({"native_available": native.available(),
                      "nproc": os.cpu_count()}), flush=True)

    with tempfile.TemporaryDirectory() as root:
        paths = make_jpegs(root, args.n)
        out = {"n_images": args.n}

        # single-thread PIL fallback floor (what a no-native install pays)
        from swat_tpu.data.transforms import load_image, train_canvas

        def pil_canvases():
            for p in paths:
                train_canvas(load_image(p), 256)

        dt = timed(pil_canvases, reps=1)
        out["pil_canvas_ms_per_img"] = round(dt / args.n * 1e3, 2)
        out["pil_canvas_img_per_sec"] = round(args.n / dt, 1)
        print(json.dumps({"pil_1thread": out["pil_canvas_img_per_sec"]}),
              flush=True)

        if native.available():
            for layout, fn in (
                    ("canvas", lambda t: native.batch_train_canvases(
                        paths, 256, threads=t)),
                    ("eval", lambda t: native.batch_eval_pixels(
                        paths, 224, threads=t))):
                for t in threads:
                    dt = timed(lambda: fn(t))
                    key = f"native_{layout}_t{t}"
                    out[key + "_img_per_sec"] = round(args.n / dt, 1)
                    out[key + "_ms_per_img"] = round(dt / args.n * 1e3, 2)
                    print(json.dumps(
                        {key: out[key + "_img_per_sec"]}), flush=True)

        print(json.dumps(out))


if __name__ == "__main__":
    main()
