"""Histogram plotting: matplotlib ports of the reference's R scripts.

plot_histo      <- utils/plot-histo.R   (log-y abundance spectrum)
plot_histo2d    <- utils/plot-histo2D.R (KAT-style stacked spectrum:
                   read-abundance x axis, stacked by assembly abundance
                   0x..5x, auto y/x limits like the R script)

Usage:
    python -m dsk_tpu.utils.plots out.histo
    python -m dsk_tpu.utils.plots out.histo2D
"""

from __future__ import annotations

import sys

import numpy as np


def plot_histo(path: str, xmax: int | None = None, out: str | None = None) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.loadtxt(path)
    x, y = data[:, 0], data[:, 1]
    if xmax is None:
        nz = np.nonzero(y)[0]
        xmax = int(x[nz[-1]]) if nz.size else int(x[-1])
    fig, ax = plt.subplots(figsize=(7, 6))
    ax.plot(x, np.maximum(y, 0.5))
    ax.set_yscale("log")
    ax.set_xlim(0, xmax)
    ax.set_xlabel("Kmer abundance")
    ax.set_ylabel("Number of distinct kmers")
    ax.set_title("Kmer profile")
    ax.grid(True, ls="-", lw=0.3)
    out = out or path + ".png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_histo2d(path: str, xmax: int | None = None, out: str | None = None) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tab = np.loadtxt(path)
    mat = tab[:, 1:]  # drop the abundance label column
    # auto ymax/xmax heuristics as in plot-histo2D.R:24-40
    linetot = mat[1:-1].sum(axis=1)
    d = np.diff(linetot)
    inc = np.nonzero(d > 0)[0]
    beg = inc[0] + 1 if inc.size else 0
    ymax = linetot[beg:].max() * 1.05 if linetot[beg:].size else 1.0
    if xmax is None:
        big = np.nonzero(linetot >= 0.5 * ymax / 100)[0]
        xmax = int(big[-1]) + 1 if big.size else mat.shape[0]
    colors = ["black", "red", "mediumpurple", "palegreen", "steelblue", "peachpuff"]
    fig, ax = plt.subplots(figsize=(7, 6))
    bottom = np.zeros(xmax)
    xs = np.arange(1, xmax + 1)
    for c in range(6):
        vals = mat[1 : xmax + 1, c]
        ax.bar(xs, vals, bottom=bottom, width=1.0, color=colors[c],
               label=f"{c}x")
        bottom += vals
    ax.set_ylim(0, ymax)
    ax.set_xlabel("kmer multiplicity")
    ax.set_ylabel("Number of distinct kmers")
    ax.set_title("kmer comparison plot")
    ax.legend()
    out = out or path + ".png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_sweep(rows: list[dict], out: str) -> str:
    """figure-1 analog plot (doc/figure-1's runtime-vs-resources
    curves): wallclock vs -max-memory, one line per (spill, passes)
    series; crashed cells marked x at the top."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 6))
    series: dict[tuple, list] = {}
    crashed = []
    for r in rows:
        key = (r.get("spill", "auto"), r.get("n_passes"))
        if r.get("status") == "ok":
            series.setdefault(key, []).append(
                (r["mem_mb"], r["wall_s"], r.get("peak_rss_mb", 0))
            )
        else:
            crashed.append((r["mem_mb"], r.get("status", "crashed")))
    for (sp, np_), pts in sorted(series.items()):
        pts.sort()
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        ax.plot(
            xs, ys, marker="o",
            label=f"spill={sp}"
            + (f", passes={np_}" if np_ is not None else ""),
        )
    top = max(
        (p[1] for pts in series.values() for p in pts), default=1.0
    )
    for mem, _status in crashed:
        ax.plot([mem], [top * 1.1], marker="x", color="red", ms=10)
    ax.set_xscale("log")
    ax.set_xlabel("-max-memory (MB)")
    ax.set_ylabel("wallclock (s)")
    ax.set_title("resource sweep (figure-1 analog)")
    ax.grid(True, ls="-", lw=0.3)
    if series:
        ax.legend(fontsize=8)
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def main(argv: list[str] | None = None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print(__doc__, file=sys.stderr)
        return 1
    path = args[0]
    xmax = int(args[1]) if len(args) > 1 else None
    if path.endswith(".histo2D"):
        out = plot_histo2d(path, xmax)
    else:
        out = plot_histo(path, xmax)
    print(f"... done, image output in file {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
