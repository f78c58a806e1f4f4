"""Build a blobstore of wav bytes from a Kaldi wav.scp.

CLI analog of the reference's tools/make_lmdb.py:31-55 (which packs
noise/RIR augmentation corpora into lmdb).  This framework's packed
store (data/blobstore.py) is a flat ``<out>.blob`` + ``<out>.idx``
pair — dependency-free, mmap-friendly, readable by BlobData and the
lmdb-shim reader alike.

Usage:
    python -m wekws_tpu.tools.make_blob in.scp out_store
    # -> out_store.blob, out_store.idx
"""

import argparse
import sys

from wekws_tpu.data.blobstore import BlobWriter


def make_blob(scp_file: str, out_path: str) -> int:
    """Pack ``key path`` scp lines into a blobstore.  Returns count."""
    n = 0
    with BlobWriter(out_path) as writer:
        with open(scp_file, "r", encoding="utf8") as fin:
            for line_no, line in enumerate(fin, 1):
                arr = line.strip().split()
                if not arr:
                    continue
                assert len(arr) == 2, (
                    f"{scp_file}:{line_no}: expected 'key path', got "
                    f"{line.strip()!r}"
                )
                key, wav = arr
                with open(wav, "rb") as f:
                    writer.put(key, f.read())
                n += 1
    return n


def main():
    parser = argparse.ArgumentParser(
        description="pack wav files into a blobstore (lmdb analog)"
    )
    parser.add_argument("in_scp_file", help="wav.scp: '<key> <path>' lines")
    parser.add_argument("out_store", help="output prefix (.blob/.idx)")
    args = parser.parse_args()
    n = make_blob(args.in_scp_file, args.out_store)
    print(f"packed {n} entries -> {args.out_store}.blob", file=sys.stderr)


if __name__ == "__main__":
    main()
