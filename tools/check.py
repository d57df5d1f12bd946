#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir parquet tables,
normalizes both sides (columns sorted by name, rows sorted by all columns),
and reports exact-match / near-match (float tolerance) / mismatch.
"""
import glob
import json
import math
import os
import re
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def check_doc_counts(n_queries):
    """Ledger hygiene: the suite counts README.md and SURVEY.md claim must
    equal the number of queries Verify actually dumped — doc drift was a
    recurring judge finding, so the gate enforces it."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    problems = []
    for fname, pattern in (
        ("README.md", r"\((\d+) as of round"),
        ("SURVEY.md", r"Suite count: (\d+)"),
    ):
        try:
            text = open(os.path.join(repo, fname)).read()
        except OSError as e:
            problems.append(f"{fname}: unreadable ({e})")
            continue
        m = re.search(pattern, text)
        if not m:
            problems.append(f"{fname}: missing pinned suite-count marker {pattern!r}")
        elif int(m.group(1)) != n_queries:
            problems.append(
                f"{fname}: claims {m.group(1)} queries, suite has {n_queries}"
            )
    for p in problems:
        print(f"FAIL  doc-count: {p}")
    return len(problems)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(
        g.rstrip("/").split("/")[-1] for g in glob.glob(f"{outdir}/*/")
    )
    passed = failed = weak = 0
    for name in names:
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL  {name}: no result parquet")
            failed += 1
            continue
        got = con.execute(
            "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
        )
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"weak  {name}: rows={len(grows)} (no oracle, rows-only check)")
            weak += 1
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failed += 1
            continue
        gc, gr = norm(grows, gcols)
        ec, er = norm(erows, ecols)
        if gc != ec:
            print(f"FAIL  {name}: columns {gc} != oracle {ec}")
            failed += 1
        elif gr == er:
            print(f"pass  {name}: {len(gr)} rows")
            passed += 1
        else:
            print(f"FAIL  {name}: rows differ (got {len(gr)}, oracle {len(er)})")
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    print(f"      first diff row {i}:\n        got {a}\n        exp {b}")
                    break
            if len(gr) != len(er):
                only_g = set(gr) - set(er)
                only_e = set(er) - set(gr)
                if only_g:
                    print(f"      extra in got: {list(only_g)[:2]}")
                if only_e:
                    print(f"      missing:      {list(only_e)[:2]}")
            failed += 1
    # A full-suite run dumps (at least) every oracle-keyed query; well
    # under that means a SPARK_GRAFT_ONLY-narrowed local check, where the
    # suite-level checks below don't apply. The suite size is keyed to
    # the oracle map (Verify always writes it in full), NOT to the dir
    # count — stale dirs from a reused outdir must neither inflate the
    # count nor hide a query that crashed before dumping.
    full_run = len(names) * 2 >= len(oracle)
    if full_run:
        for name in sorted(set(oracle) - set(names)):
            print(f"FAIL  {name}: oracle present but no result dir "
                  "(query crashed in Verify?)")
            failed += 1
        failed += check_doc_counts(len(oracle))
    else:
        print(f"note  doc-count/missing-dir checks skipped (targeted run: "
              f"{len(names)}/{len(oracle)} queries dumped)")
    print(f"\n== {passed} pass, {weak} weak(rows-only), {failed} FAIL ==")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
