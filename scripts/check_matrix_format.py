#!/usr/bin/env python
"""Sanity-check a counts matrix file before running the pipeline.

Analogue of the reference's scripts/check_matrix_format.py: reports matrix
dimensions, header alignment, duplicate gene/cell names, non-numeric
entries, and negative values.

Usage: check_matrix_format.py counts.matrix[.gz]
"""

import gzip
import sys
from collections import Counter


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__, file=sys.stderr)
        return 1
    path = sys.argv[1]
    opener = gzip.open if path.endswith(".gz") else open
    problems = 0
    with opener(path, "rt") as f:
        header = f.readline().rstrip("\n").split("\t")
        first = f.readline().rstrip("\n").split("\t")
        ncols = len(first) - 1
        if len(header) == ncols:
            cells = header
        elif len(header) == ncols + 1:
            cells = header[1:]
            print("note: header has a leading corner label")
        else:
            print(f"PROBLEM: header has {len(header)} fields but data rows have {ncols} values")
            problems += 1
            cells = header[-ncols:]
        dup_cells = [c for c, n in Counter(cells).items() if n > 1]
        if dup_cells:
            print(f"PROBLEM: {len(dup_cells)} duplicated cell names, e.g. {dup_cells[:3]}")
            problems += 1
        genes = []
        nrows = 1
        bad_numeric = 0
        negative = 0
        for line in [("\t".join(first))] + f.readlines():
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            genes.append(parts[0])
            if len(parts) - 1 != ncols:
                print(f"PROBLEM: row {parts[0]} has {len(parts)-1} values, expected {ncols}")
                problems += 1
            for v in parts[1:]:
                try:
                    fv = float(v)
                    if fv < 0:
                        negative += 1
                except ValueError:
                    bad_numeric += 1
            nrows += 1
    dup_genes = [g for g, n in Counter(genes).items() if n > 1]
    if dup_genes:
        print(f"PROBLEM: {len(dup_genes)} duplicated gene names, e.g. {dup_genes[:3]}")
        problems += 1
    if bad_numeric:
        print(f"PROBLEM: {bad_numeric} non-numeric entries")
        problems += 1
    if negative:
        print(f"PROBLEM: {negative} negative values (raw counts expected)")
        problems += 1
    print(f"matrix: {len(genes)} genes x {ncols} cells")
    print("OK" if problems == 0 else f"{problems} problem(s) found")
    return 0 if problems == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
