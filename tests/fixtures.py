"""Synthetic domain fixtures per FIXTURES.md (seq/site/groups/VCF).

Deterministic (seed fixed), small (n_samples=30, n_loci=300 by default
— keeps shared_loci > 100 satisfiable against the reference gate), with
bad variants violating exactly one named constraint each.
"""

from __future__ import annotations

import gzip
import os
import random

ALLELES = "ACGT"


def make_domain_fixtures(
    out_dir: str, *, n_samples: int = 30, n_loci: int = 300, seed: int = 7
) -> dict[str, str]:
    """Write seq/site/groups/reference-site/VCF files; return paths."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    paths: dict[str, str] = {}

    samples = [f"ind{i:03d}" for i in range(n_samples)]
    groups = [(s, f"group{i % 5}") for i, s in enumerate(samples)]
    loci = []
    for i in range(n_loci):
        ref = rng.choice(ALLELES)
        alt = rng.choice([a for a in ALLELES if a != ref])
        loci.append((str(rng.randint(1, 22)), 10_000 + i * 17, f"rs{i:05d}", ref, alt))

    # groups (plain TSV, 2 cols)
    paths["groups"] = os.path.join(out_dir, "study.groups")
    with open(paths["groups"], "w") as f:
        for s, g in groups:
            f.write(f"{s}\t{g}\n")

    # seq (gzipped, tab/space separated, 2 + 3*n_loci fields)
    paths["seq"] = os.path.join(out_dir, "study.seq.gz")
    with gzip.open(paths["seq"], "wt") as f:
        for s in samples:
            vals = []
            for _ in range(n_loci):
                vals += [str(rng.randint(0, 60)), str(rng.randint(0, 30)), str(rng.randint(0, 2))]
            f.write("pop1 " + s + " " + " ".join(vals) + "\n")

    # site (gzipped TSV with header)
    paths["site"] = os.path.join(out_dir, "study.site.gz")
    with gzip.open(paths["site"], "wt") as f:
        f.write("CHR\tPOS\tID\tREF\tALT\n")
        for chr_, pos, id_, ref, alt in loci:
            f.write(f"{chr_}\t{pos}\t{id_}\t{ref}\t{alt}\n")

    # reference panel site: ~70% overlap on (chr,pos); of those ~90% match
    # alleles case-insensitively (some lowercased), ~10% allele-flipped
    paths["ref_site"] = os.path.join(out_dir, "panel.site.gz")
    with gzip.open(paths["ref_site"], "wt") as f:
        f.write("CHR\tPOS\tID\tREF\tALT\n")
        for i, (chr_, pos, id_, ref, alt) in enumerate(loci):
            if i % 10 >= 7:  # 30% not in panel
                continue
            if i % 10 == 6:  # allele flip: matches key, fails residual
                ref, alt = alt, ref
            elif i % 3 == 0:  # case-fold exercise
                ref, alt = ref.lower(), alt.lower()
            f.write(f"{chr_}\t{pos}\t{id_}\t{ref}\t{alt}\n")

    # VCF (gzipped): site-major, 9 fixed cols + per-sample GT
    paths["vcf"] = os.path.join(out_dir, "study.vcf.gz")
    _write_vcf(paths["vcf"], samples, loci, rng)
    # second VCF with the same sample set (multi-file union)
    paths["vcf2"] = os.path.join(out_dir, "study2.vcf.gz")
    _write_vcf(paths["vcf2"], samples, loci[: n_loci // 2], rng)

    # bad variants: each violates exactly one constraint
    paths["groups_bad_arity"] = os.path.join(out_dir, "bad_arity.groups")
    with open(paths["groups_bad_arity"], "w") as f:
        f.write("ind000\tgroup0\n")
        f.write("ind001\tgroup0\textra\n")  # 3 columns

    paths["seq_bad_arity"] = os.path.join(out_dir, "bad_arity.seq.gz")
    with gzip.open(paths["seq_bad_arity"], "wt") as f:
        f.write("pop1 ind000 1 2\n")  # (4-2) % 3 != 0

    paths["seq_inconsistent"] = os.path.join(out_dir, "inconsistent.seq.gz")
    with gzip.open(paths["seq_inconsistent"], "wt") as f:
        f.write("pop1 ind000 " + " ".join(["1"] * 9) + "\n")
        f.write("pop1 ind001 " + " ".join(["1"] * 12) + "\n")  # different arity

    paths["seq_unknown_sample"] = os.path.join(out_dir, "unknown.seq.gz")
    with gzip.open(paths["seq_unknown_sample"], "wt") as f:
        f.write("pop1 GHOST " + " ".join(["1"] * 9) + "\n")

    paths["site_bad_header"] = os.path.join(out_dir, "bad_header.site.gz")
    with gzip.open(paths["site_bad_header"], "wt") as f:
        f.write("CHR\tPOS\tNAME\tREF\tALT\n1\t100\trs1\tA\tC\n")

    return paths


def _write_vcf(path: str, samples, loci, rng) -> None:
    gts = ["0/0", "0/1", "1/1", "./."]
    with gzip.open(path, "wt") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("##source=fixture\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(samples) + "\n")
        for chr_, pos, id_, ref, alt in loci:
            row = [chr_, str(pos), id_, ref, alt, ".", "PASS", ".", "GT"]
            row += [rng.choice(gts) for _ in samples]
            f.write("\t".join(row) + "\n")
