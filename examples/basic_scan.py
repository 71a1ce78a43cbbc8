#!/usr/bin/env python
"""Minimal library usage: scan a corpus file for a few patterns.

Equivalent of the reference's smoke test (`scripts/basic_test.batch`):

    python examples/basic_scan.py /root/reference/dna/small_chrY_x100.fa
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import apm


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/dna/small_chrY_x100.fa"
    corpus = apm.read_input_file(path)
    patterns = [b"GATTACA", b"CAT", b"TTTTTTTTTT"]
    for k in (0, 1, 2):
        scanner = apm.Scanner(patterns, k=k)
        counts = scanner.count(corpus)
        print(f"k={k}:")
        for p, c in zip(patterns, counts):
            print(f"  {p.decode()}: {c}")
        print(f"  ({len(corpus)} bytes in {scanner.last_duration:.4f}s, "
              f"strategy={scanner.last_strategy})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
