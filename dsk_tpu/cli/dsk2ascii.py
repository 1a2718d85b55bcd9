"""`dsk2ascii` CLI: dump an HDF5 count store as text.

Replaces the reference's dsk2ascii tool (utils/dsk2ascii.cpp): re-opens
the store, reads kmer_size from the dsk group, iterates solid partitions
in order, prints '<KMER> <count>' lines (or -fasta / -fastq shapes).
"""

from __future__ import annotations

import argparse
import sys

from dsk_tpu.kmer import codec
from dsk_tpu.store import text as store_text
from dsk_tpu.store.hdf5 import OutputStore


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dsk2ascii",
        description="dump dsk_tpu HDF5 output as text",
        add_help=False,
    )
    p.add_argument("-help", "--help", action="help")
    p.add_argument("-file", required=True, help="input .h5 count store")
    p.add_argument("-out", default=None, help="output text file (default stdout)")
    p.add_argument("-fasta", action="store_true", help="fasta-shaped output")
    p.add_argument("-fastq", action="store_true", help="fastq-shaped output")
    p.add_argument("-sorted", dest="sorted_", action="store_true",
                   help="emit globally sorted kmers (A<C<T<G order) instead "
                        "of partition order — the normative comparison form")
    p.add_argument("-c", dest="stdout", action="store_true",
                   help="force output to stdout")
    p.add_argument("-verbose", type=int, default=1)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from dsk_tpu.utils.hostmem import tune_malloc

    tune_malloc()  # the chunked decode allocates ~100 MB temps
    try:
        store = OutputStore.load(args.file)
    except (OSError, KeyError) as e:
        print(f"dsk2ascii: error: cannot open {args.file}: {e}", file=sys.stderr)
        return 1
    try:
        def dump(f):
            if args.sorted_:
                # vectorized k-way merge over the partitions' sorted
                # runs (bounded memory at any table size); legacy
                # stores without a run map fall back to a materializing
                # lexsort — still chunk-vectorized
                k = store.kmer_size
                try:
                    chunks = store.iter_sorted_rows()
                    n = 0
                    for kk, cc in chunks:
                        f.write(
                            store_text.format_count_lines(
                                codec.words_to_letters(kk, k), cc
                            )
                        )
                        n += kk.shape[0]
                    return n
                except ValueError:
                    import numpy as np

                    from dsk_tpu.store.hdf5 import _lex_order

                    parts = list(store.iter_solid())
                    kk = np.concatenate([p[0] for p in parts])
                    cc = np.concatenate(
                        [p[1].astype(np.int64) for p in parts]
                    )
                    order = _lex_order(kk)
                    kk, cc = kk[order], cc[order]
                    step = store_text.DUMP_CHUNK_ROWS
                    for off in range(0, kk.shape[0], step):
                        f.write(
                            store_text.format_count_lines(
                                codec.words_to_letters(
                                    kk[off : off + step], k
                                ),
                                cc[off : off + step],
                            )
                        )
                    return kk.shape[0]
            return store_text.dump_ascii(store, f, args.fasta, args.fastq)

        if args.out and not args.stdout:
            with open(args.out, "wb") as f:
                n = dump(f)
        else:
            n = dump(sys.stdout.buffer)
            sys.stdout.buffer.flush()
        if args.verbose and args.out:
            print(f"dsk2ascii: wrote {n} kmers -> {args.out}", file=sys.stderr)
    finally:
        store.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
