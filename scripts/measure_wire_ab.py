"""A/B the exc vs bitmap wire formats in ONE tunnel window.

Same pre-generated batches streamed through two otherwise-identical
DistCountEngines (wire="exc" / wire="bitmap"), interleaved best-of-3,
so tunnel weather cancels.  Prints per-run times + implied wire MB/s.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DSK_TPU_PUT_STREAMS", "16")
import numpy as np

from dsk_tpu.utils.hostmem import tune_malloc
tune_malloc()
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")
from bench import make_batches
from dsk_tpu.dist.engine import DistCountEngine, default_mesh

rows, row_len, k = 2048, 1024, 31
batches = make_batches(64, rows, row_len, seed=0)
total_bases = sum(b.n_bases for b in batches)

engines = {}
for wire in ("exc", "bitmap"):
    e = DistCountEngine(k, mesh=default_mesh(), batch_rows=rows,
                        row_len=row_len, buf_batches=32,
                        table_cap=(1 << 20) + (1 << 19), wire=wire)
    e.compile(progress=lambda m: print(f"[{wire}] {m}", file=sys.stderr, flush=True))
    warm = make_batches(2, rows, row_len, seed=99)
    e.count_stream(iter(warm), finalize=False)
    engines[wire] = e

wire_bytes = {"exc": rows * (256 + 34 + 4) * 64, "bitmap": rows * (256 + 128 + 4) * 64}
times = {"exc": [], "bitmap": []}
for rep in range(3):
    for wire, e in engines.items():
        t0 = time.perf_counter()
        res = e.count_stream(iter(batches), finalize=False)
        dt = time.perf_counter() - t0
        times[wire].append(dt)
        print(f"rep {rep} {wire}: {dt:.3f}s  "
              f"{total_bases/dt/1e6:.1f} Mbases/s  "
              f"{wire_bytes[wire]/dt/1e6:.1f} MB/s wire  "
              f"sub={res.info['t_sub']}", file=sys.stderr, flush=True)

# pure put capacity per format: fence every item, no steps (wire-only)
import jax as _jax
import numpy as _np
from dsk_tpu.io.packed import pack_codes, pack_codes_exc
d0 = _jax.devices()[0]
from dsk_tpu.io.prefetch import parallel_map
for wire in ("exc", "bitmap"):
    pk = pack_codes_exc if wire == "exc" else pack_codes
    items = [pk(b.codes) for b in batches]
    nbytes = sum(w.nbytes + m.nbytes for w, m in items)
    def put1(it):
        w, m = it
        wd = _jax.device_put(w, d0); md = _jax.device_put(m, d0)
        _ = _np.asarray(wd[0, 0])
        return wd, md
    for rep in range(2):
        t0 = time.perf_counter()
        outs = list(parallel_map(put1, iter(items), workers=16, inflight=17))
        dt = time.perf_counter() - t0
        del outs
        print(f"put-only {wire} rep {rep}: {dt:.3f}s  "
              f"{nbytes/dt/1e6:.1f} MB/s", file=sys.stderr, flush=True)
best = {w: min(t) for w, t in times.items()}
print({"best": best,
       "exc_mbases": round(total_bases/best["exc"]/1e6, 1),
       "bitmap_mbases": round(total_bases/best["bitmap"]/1e6, 1)})
