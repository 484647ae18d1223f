"""Machine-intrinsic scaling ceiling for the fused fetch/decode/verify
workload — NO Spark, NO Arrow.

K plain multiprocessing workers each run N/K iterations of exactly the
per-URL inner loop of operators/fetch.fetch_decode_verify (md5 image
key, synthetic pixel gen, PNG/JPGQ encode, decode, PSNR verify). The
K=8 -> K=32 speedup of THIS job is the upper bound any executor
framework can reach on this box for that stage: the residual below 4x
is the single socket's shared memory controller / clock budget, not
coordination. Referenced by BENCH/BASELINE.md.

Usage: python scripts/machine_ceiling_probe.py [K ...]   (default 8 32 8 32)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 120_000


def work(args):
    lo, hi = args
    from cola_spark.codecs import decode_image, encode_image
    from cola_spark.codecs.pixels import gen_pixels, psnr

    dl = [48, 64]
    ok = 0
    for i in range(lo, hi):
        image_id = f"img{i % 2000:08d}"
        d = hashlib.md5(image_id.encode()).digest()
        w, h = dl[d[2] % 2], dl[d[3] % 2]
        fmt = "png" if d[4] % 2 == 0 else "jpgq"
        px = gen_pixels(image_id, w, h)
        payload = encode_image(px, fmt)
        dec = decode_image(payload, fmt)
        p = psnr(px, dec)
        ok += (fmt == "png" and p == float("inf")) or (fmt != "png" and p >= 40.0)
    return ok


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [8, 32, 8, 32]
    results: dict[int, float] = {}
    for k in ks:
        chunks = [(j * N // k, (j + 1) * N // k) for j in range(k)]
        with Pool(k) as pool:
            pool.map(work, [(0, 10)] * k)  # warm imports per worker
            t0 = time.monotonic()
            res = pool.map(work, chunks)
            secs = time.monotonic() - t0
        assert sum(res) == N
        results[k] = min(results.get(k, 1e18), secs)
        print(f"K={k} N={N} secs={secs:.2f} thr={N / secs:.0f}/s")
    if 8 in results and 32 in results:
        sp = results[8] / results[32]
        print(f"machine ceiling 8->32: {sp:.2f}x (eff {sp / 4:.2f})")


if __name__ == "__main__":
    main()
