"""`dskdump`: dataset extraction from the HDF5 store (gatb-h5dump analog).

The reference's test pipeline extracts datasets as text with gatb-h5dump
(scripts/simple_test.sh:37: `gatb-h5dump -y -d histogram/histogram out.h5`).
This prints:

  histogram/histogram  ->  '<abundance>\t<count>' per line
  dsk/solid/<i>        ->  '<KMER> <count>' per line (decoded)
  dsk/solid            ->  all partitions concatenated

Usage:  python -m dsk_tpu.cli.dskdump -d histogram/histogram out.h5
"""

from __future__ import annotations

import argparse
import sys

from dsk_tpu.kmer import codec
from dsk_tpu.store.hdf5 import OutputStore


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dskdump", add_help=False)
    p.add_argument("-help", "--help", action="help")
    p.add_argument("-d", dest="dataset", required=True,
                   help="dataset path (histogram/histogram, dsk/solid[/<i>])")
    p.add_argument("-y", action="store_true", help="ignored (h5dump compat)")
    p.add_argument("file")
    args = p.parse_args(argv)
    from dsk_tpu.utils.hostmem import tune_malloc

    tune_malloc()  # the chunked decode allocates ~100 MB temps
    try:
        store = OutputStore.load(args.file)
    except (OSError, KeyError) as e:
        print(f"dskdump: cannot open {args.file}: {e}", file=sys.stderr)
        return 1
    try:
        ds = args.dataset.strip("/")
        if ds == "histogram/histogram":
            hist = store.histogram()
            for a in range(1, hist.shape[0]):
                sys.stdout.write(f"{a}\t{int(hist[a])}\n")
        elif ds.startswith("dsk/solid"):
            from dsk_tpu.store import text as store_text

            k = store.kmer_size
            parts = list(store.iter_solid())
            sel = ds[len("dsk/solid"):].strip("/")
            if sel:
                parts = [parts[int(sel)]]
            step = store_text.DUMP_CHUNK_ROWS
            for kmers, counts in parts:
                for off in range(0, kmers.shape[0], step):
                    sys.stdout.buffer.write(
                        store_text.format_count_lines(
                            codec.words_to_letters(
                                kmers[off : off + step], k
                            ),
                            counts[off : off + step],
                        )
                    )
            sys.stdout.buffer.flush()
        else:
            print(f"dskdump: unknown dataset {args.dataset}", file=sys.stderr)
            return 1
    finally:
        store.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
