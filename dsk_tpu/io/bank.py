"""Bank resolution & composition.

Replaces the reference's Bank facade / BankRegistery / BankAlbum /
BankComposite (gatb-core bank/impl, SURVEY.md C10; behavior per
reference README.md:52-61):

  * ``a.fasta,b.fastq.gz,c.fa``  (comma list)  -> composite bank
  * a text file whose lines are filenames      -> album bank
  * a single FASTA/FASTQ file (.gz or not)     -> simple bank

Each sub-bank keeps its index (bank_id) — required by multi-bank solidity
kinds and the histo2D per-bank counting (SURVEY.md C7).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterator

from dsk_tpu.io.fasta import Sequence, estimate_bases, iter_sequences

_SEQ_EXTS = (
    ".fa", ".fasta", ".fna", ".fq", ".fastq",
    ".fa.gz", ".fasta.gz", ".fna.gz", ".fq.gz", ".fastq.gz", ".gz",
)


def _looks_like_album(path: str) -> bool:
    """A plain-text file whose first line names an existing-ish file."""
    if path.endswith(_SEQ_EXTS):
        return False
    try:
        with open(path, "rb") as f:
            head = f.read(4096)
    except OSError:
        return False
    if head[:2] == b"\x1f\x8b" or head[:1] in (b">", b"@"):
        return False
    lines = [ln.strip() for ln in head.split(b"\n") if ln.strip()]
    if not lines:
        return False
    return all(ln.decode(errors="replace").endswith(_SEQ_EXTS) for ln in lines[:4])


@dataclass
class Bank:
    """An ordered list of sequence files, each a sub-bank.

    A sharded view (multi-host input sharding, dist/multihost.py) sets
    `units` — explicit ReadUnits whose bank_id is the ORIGINAL sub-bank
    index — and `nb_banks_total`, so per-bank semantics (solidity kinds,
    histo2D) stay globally correct on every host.
    """

    uri: str
    files: list[str] = field(default_factory=list)
    units: list | None = None          # list[ReadUnit] override
    nb_banks_total: int | None = None  # original bank count (sharded views)

    @property
    def nb_banks(self) -> int:
        if self.nb_banks_total is not None:
            return self.nb_banks_total
        return len(self.files)

    def iter_sequences(self) -> Iterator[tuple[int, Sequence]]:
        """Yield (bank_id, Sequence) over all sub-banks in order."""
        for bank_id, path in enumerate(self.files):
            for seq in iter_sequences(path):
                yield bank_id, seq

    def estimate(self) -> tuple[int, float]:
        """(estimated total bases, mean read length) across all files."""
        total = 0
        lens = []
        for path in self.files:
            b, ml = estimate_bases(path)
            total += b
            lens.append(ml)
        mean_len = sum(lens) / max(len(lens), 1)
        return total, mean_len


def open_bank(uri: str, base_dir: str | None = None) -> Bank:
    """Resolve a bank URI (single file, comma list, or album file)."""
    if "," in uri:
        files = []
        for part in uri.split(","):
            part = part.strip()
            if part:
                files.extend(open_bank(part, base_dir).files)
        return Bank(uri=uri, files=files)

    path = uri
    if base_dir and not os.path.isabs(path) and not os.path.exists(path):
        cand = os.path.join(base_dir, path)
        if os.path.exists(cand):
            path = cand
    if not os.path.exists(path):
        raise FileNotFoundError(f"bank not found: {uri}")

    if _looks_like_album(path):
        album_dir = os.path.dirname(os.path.abspath(path))
        files = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                sub = line
                if not os.path.isabs(sub):
                    # album entries resolve relative to the album file's dir,
                    # tolerating entries like "test/x.fa" relative to its parent
                    for cand in (
                        os.path.join(album_dir, sub),
                        os.path.join(os.path.dirname(album_dir), sub),
                        os.path.join(album_dir, os.path.basename(sub)),
                    ):
                        if os.path.exists(cand):
                            sub = cand
                            break
                files.extend(open_bank(sub, base_dir).files)
        return Bank(uri=uri, files=files)

    return Bank(uri=uri, files=[path])
