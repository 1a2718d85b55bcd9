"""Fence-variant probe for H2D puts through the axon tunnel.

The count stream fences every device_put with a 1-element fetch (an
eager slice dispatch + a reverse-channel D2H) to force the lazy tunnel
transfer to stream NOW.  t_put measurements (measure_wire_ab.py) show
~0.3-0.7 s of put-thread time per 0.6 MB item => the fence, not the
bytes, may dominate.  Variants over the same 64 exc-packed items:

  getitem   current: np.asarray(x[0,0]) per put
  block     x.block_until_ready() per put (no eager slice, no D2H)
  none+blk  bare device_put, ONE block_until_ready on the last item
  every4    getitem fence on every 4th item only
  pair      2 batches coalesced per put (getitem fence)
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DSK_TPU_PUT_STREAMS", "16")
import numpy as np
from dsk_tpu.utils.hostmem import tune_malloc
tune_malloc()
import jax
from bench import make_batches
from dsk_tpu.io.packed import pack_codes_exc
from dsk_tpu.io.prefetch import parallel_map

rows, row_len = 2048, 1024
batches = make_batches(64, rows, row_len, seed=0)
items = [pack_codes_exc(b.codes) for b in batches]
nbytes = sum(w.nbytes + m.nbytes for w, m in items)
d0 = jax.devices()[0]

# tiny warmup put+fetch first (CLAUDE.md: first-D2H flakiness)
w = jax.device_put(np.zeros((2, 2), np.uint32), d0)
_ = np.asarray(w[0, 0])
print("warmup done", file=sys.stderr, flush=True)

def run(name, put1, its, reps=2):
    for rep in range(reps):
        outs = []
        t0 = time.perf_counter()
        outs = list(parallel_map(put1, iter(its), workers=16, inflight=17))
        if name.startswith("none"):
            jax.block_until_ready(outs[-1])
        dt = time.perf_counter() - t0
        # verify everything actually landed: block on all (outside timer
        # for fenced variants; a second timer shows hidden lag)
        t1 = time.perf_counter()
        jax.block_until_ready(outs)
        lag = time.perf_counter() - t1
        del outs
        print(f"{name:9s} rep {rep}: {dt:6.3f}s  {nbytes/dt/1e6:6.1f} MB/s"
              f"  (+{lag:5.3f}s lag-to-ready)", file=sys.stderr, flush=True)

def put_getitem(it):
    w, m = it
    wd = jax.device_put(w, d0); md = jax.device_put(m, d0)
    _ = np.asarray(wd[0, 0])
    return wd, md

def put_block(it):
    w, m = it
    wd = jax.device_put(w, d0); md = jax.device_put(m, d0)
    jax.block_until_ready(wd); jax.block_until_ready(md)
    return wd, md

def put_bare(it):
    w, m = it
    return jax.device_put(w, d0), jax.device_put(m, d0)

cnt = [0]
def put_every4(it):
    w, m = it
    wd = jax.device_put(w, d0); md = jax.device_put(m, d0)
    cnt[0] += 1
    if cnt[0] % 4 == 0:
        _ = np.asarray(wd[0, 0])
    return wd, md

pairs = [(np.stack([items[i][0], items[i+1][0]]),
          np.stack([items[i][1], items[i+1][1]])) for i in range(0, 64, 2)]

quads = [(np.stack([items[i+j][0] for j in range(4)]),
          np.stack([items[i+j][1] for j in range(4)])) for i in range(0, 64, 4)]

# INTERLEAVED reps: tunnel weather drifts minute-to-minute, so each
# variant runs once per round and medians are compared across rounds
for rep in range(4):
    run("getitem", put_getitem, items, 1)
    run("every4", put_every4, items, 1)
    run("pair", put_getitem, pairs, 1)
    run("quad", put_getitem, quads, 1)
    run("none+blk", put_bare, items, 1)
print("done")
