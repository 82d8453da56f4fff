#!/usr/bin/env python
"""Convert a GTF annotation into the 4-column gene position file
(gene, chr, start, stop) that infercnv_tpu (and the reference) consume.

Analogue of the reference's scripts/gtf_to_position_file.py utility: for
each gene (by the chosen attribute, default gene_name), emit the chromosome
and the min start / max stop over its records.

Usage: gtf_to_position_file.py [--attribute_name gene_name] in.gtf out.txt
"""

import argparse
import gzip
import re
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("gtf")
    ap.add_argument("out")
    ap.add_argument("--attribute_name", default="gene_name",
                    help="GTF attribute used as the gene identifier")
    args = ap.parse_args()

    pat = re.compile(args.attribute_name + r'\s+"([^"]+)"')
    genes = {}  # name -> [chr, start, stop]
    opener = gzip.open if args.gtf.endswith(".gz") else open
    with opener(args.gtf, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 9:
                continue
            chrom, _src, _feat, start, stop = parts[0], parts[1], parts[2], parts[3], parts[4]
            m = pat.search(parts[8])
            if not m:
                continue
            name = m.group(1)
            start, stop = int(start), int(stop)
            ent = genes.get(name)
            if ent is None:
                genes[name] = [chrom, start, stop]
            else:
                if ent[0] == chrom:
                    ent[1] = min(ent[1], start)
                    ent[2] = max(ent[2], stop)
    with open(args.out, "w") as out:
        for name, (chrom, start, stop) in genes.items():
            out.write(f"{name}\t{chrom}\t{start}\t{stop}\n")
    print(f"wrote {len(genes)} genes to {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
