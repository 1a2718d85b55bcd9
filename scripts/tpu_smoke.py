"""Real-TPU smoke test: compiled Pallas extraction kernel vs jnp reference.

The CPU pytest suite exercises the kernel only in interpret mode
(tests/test_pallas_kernels.py); this script runs the COMPILED kernel on the
real chip (JAX_PLATFORMS=axon) over L>=128 rows — the production gate at
dsk_tpu/kmer/pallas_kernels.py:extract_canonical_planes — and cross-checks
against extract_canonical_planes_jnp on the same device.

Run:  python scripts/tpu_smoke.py          (exit 0 = parity, != 0 = mismatch)
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    dev = jax.devices()[0]
    print(f"[smoke] device: {dev.device_kind} ({dev.platform})", file=sys.stderr, flush=True)
    if dev.platform != "tpu":
        print("[smoke] SKIP: no TPU backend", file=sys.stderr)
        return 0

    from dsk_tpu.kmer.pallas_kernels import (
        extract_canonical_planes_jnp,
        extract_canonical_planes_tpu,
    )

    rng = np.random.default_rng(0)
    failures = 0
    for k in (15, 16, 21, 27, 31, 32, 33, 63, 64, 65):
        batch = rng.integers(0, 4, size=(16, 256)).astype(np.uint8)
        bad = rng.random(batch.shape) < 0.03
        batch = np.where(bad, np.uint8(4), batch)
        b = jax.device_put(batch, dev)
        planes_p, valid_p = jax.block_until_ready(extract_canonical_planes_tpu(b, k))
        planes_j, valid_j = jax.block_until_ready(extract_canonical_planes_jnp(b, k))
        ok = bool(
            np.array_equal(np.asarray(valid_p), np.asarray(valid_j))
            and np.array_equal(np.asarray(planes_p), np.asarray(planes_j))
        )
        print(f"[smoke] k={k}: {'ok' if ok else 'MISMATCH'}", file=sys.stderr, flush=True)
        failures += not ok
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
