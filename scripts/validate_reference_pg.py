#!/usr/bin/env python3
"""Run the ACTUAL reference extension (thevermeer/pg_ts_semantic_headline,
loaded verbatim into a throwaway PostgreSQL) side-by-side with the
engine on randomized documents × queries, and diff:

  1. TSP_QUERY_MATCHES rows (words, start_pos, end_pos per phrase) —
     the core exact-phrase-match operator;
  2. TS_SEMANTIC_HEADLINE strings — the flagship drop-in API.

This extends the 33 string-exact pgTAP goldens (tests/
test_headline_golden.py) to arbitrary fuzz: the reference itself is
the oracle, executed live. The reference SQL is only EXECUTED here
(concatenated into the scratch database exactly like its package.sh
does); nothing is copied into the engine.

Usage: python scripts/validate_reference_pg.py [n_docs] [seed] [config]

config = english (default) or german. The German sweep classifies one
KNOWN oracle artifact instead of failing on it: this harness's
throwaway PG runs under the C locale, where the reference's own SQL
regexes see `\\w` as ASCII-only and strip a window-LEADING umlaut
letter ('über' -> 'ber'); the engine keeps the goldens' environment
semantics (umlauts are letters AND non-ASCII symbol runs count as
parser words — the combination the reference's own pgTAP expected
strings pin, reproduced here only under the C-locale word-class side).
Locale probes: a C.utf8 instance classifies '—' as blank and produces
a LONGER window than the german golden, while the C instance matches
the golden's dash counting but mangles leading umlauts — the goldens'
source environment (BSD-style wctype) had both dash-as-word and
umlauts-as-letters, which is exactly what the engine implements.
"""

import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from validate_stemmers_pg import start_throwaway_pg  # noqa: E402

REFERENCE_SQL_DIR = "/root/reference/sql"

VOCAB = {
    "english": ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
                "dog", "spark", "window", "merge", "sort", "running",
                "quickly", "fortune", "kingdom", "child-bearing", "don't",
                "naïve", "decide", "negatively", "batch", "stream",
                "jumped", "dogs"],
    "german": ["der", "die", "das", "Hund", "schläft", "im", "Garten",
               "neben", "dem", "Haus", "bleibenden", "Gäste", "zechten",
               "Hochzeitsgeschenk", "selbstverständlich", "Seezungen",
               "gestiftet", "Mädchen", "schöne", "Würde", "große",
               "kleine", "Bücher", "Kinder", "spielen", "draußen",
               "über", "straße", "—", "Fenster"],
}

QUERY_SET = {
    "english": ["jumping", "quick <-> brown", "fox & dog", "lazy | spark",
                "the <2> fox", "dog & !cat", "running", "merge <-> sort",
                "fortune", "decide <-> negatively", "window | sort",
                "quick & brown & fox"],
    "german": ["Gäste", "bleibenden <-> Gäste", "Hund & Garten",
               "zechten | spielen", "schöne", "Kinder & !Katze",
               "Bücher"],
}

_UMLAUTS = "üäößÜÄÖ"


def _is_c_locale_umlaut_artifact(eng: str, ref: str) -> bool:
    """True when the only difference is the oracle's C-locale regex
    stripping leading non-ASCII letters off the window's first token."""
    if not eng or not ref or eng == ref:
        return False
    et, rt = eng.split(" ", 1) if " " in eng else (eng, ""), \
        ref.split(" ", 1) if " " in ref else (ref, "")
    if et[1] != rt[1]:
        return False
    return et[0].lstrip(_UMLAUTS) == rt[0] and et[0] != rt[0]


def _psql(sock, port, args, **kw):
    user = "nobody" if os.geteuid() == 0 else os.environ.get(
        "USER", "postgres")
    return subprocess.run(
        ["psql", "-h", sock, "-p", str(port), "-U", user, "postgres"]
        + args, capture_output=True, text=True, cwd="/tmp", **kw)


def load_reference(sock, port):
    combined = "/tmp/_ref_ext_combined.sql"
    with open(combined, "w") as out:
        for name in sorted(os.listdir(REFERENCE_SQL_DIR)):
            if name.endswith(".sql"):
                out.write(open(os.path.join(REFERENCE_SQL_DIR, name))
                          .read() + "\n")
    r = _psql(sock, port, ["-c", "CREATE EXTENSION IF NOT EXISTS unaccent"])
    assert r.returncode == 0, r.stderr[:300]
    r = _psql(sock, port, ["-f", combined])
    assert r.returncode == 0, r.stderr[:300]
    probe = _psql(sock, port, ["-t", "-A", "-c",
                               "SELECT TS_SEMANTIC_HEADLINE('english', "
                               "'quick fox', TO_TSPQUERY('english', "
                               "'fox'))"])
    assert "<b>fox</b>" in probe.stdout, probe.stdout + probe.stderr


def esc(s: str) -> str:
    return s.replace("'", "''")


def ref_matches(sock, port, config, content, qtext):
    q = (f"SELECT words, start_pos, end_pos FROM TSP_QUERY_MATCHES("
         f"'{config}'::regconfig, TO_TSP_TEXT_ARRAY('{esc(content)}'), "
         f"TO_TSPVECTOR('{config}', '{esc(content)}'), "
         f"TO_TSPQUERY('{config}', '{esc(qtext)}'), 100) "
         f"ORDER BY start_pos, end_pos, words")
    out = _psql(sock, port, ["-t", "-A", "-F", "\t", "-c", q])
    if out.returncode != 0:
        return ("REF-ERROR", out.stderr.strip()[:160])
    rows = []
    for line in out.stdout.strip().splitlines():
        if line:
            w, a, b = line.split("\t")
            rows.append((w, int(a), int(b)))
    return sorted(rows)


def ref_headline(sock, port, config, content, qtext):
    q = (f"SELECT TS_SEMANTIC_HEADLINE('{config}'::regconfig, "
         f"'{esc(content)}', TO_TSPQUERY('{config}', '{esc(qtext)}'))")
    out = _psql(sock, port, ["-t", "-A", "-c", q])
    if out.returncode != 0:
        return ("REF-ERROR", out.stderr.strip()[:160])
    return out.stdout.rstrip("\n")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    config = sys.argv[3] if len(sys.argv) > 3 else "english"

    rng = random.Random(seed)
    docs = [" ".join(rng.choice(VOCAB[config])
                     for _ in range(rng.randint(4, 40)))
            for _ in range(n_docs)]

    sock, port = os.environ.get("PGV_SOCKET"), os.environ.get("PGV_PORT")
    cleanup = None
    if not sock:
        sock, port, cleanup = start_throwaway_pg()
    try:
        load_reference(sock, int(port))

        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .config("spark.sql.shuffle.partitions", "8")
                 .config("spark.ui.enabled", "false")
                 .config("spark.driver.memory", "4g").getOrCreate())
        from pg_ts_semantic_headline_spark.plans.headline import (
            ts_semantic_headline)
        from pg_ts_semantic_headline_spark.plans.matches import (
            tsp_query_matches)
        from pg_ts_semantic_headline_spark.plans.analyze import (
            with_analysis)
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery)

        df = spark.createDataFrame(
            list(enumerate(docs)), ["doc_id", "content"])
        analyzed = with_analysis(df, config=config).cache()
        analyzed.count()

        n_cases = mism = ref_err = artifacts = 0
        for qtext in QUERY_SET[config]:
            cq = to_tspquery(config, qtext)
            # engine sides, one action per query over ALL docs
            eng_m = {}
            for r in tsp_query_matches(analyzed, cq, match_limit=100
                                       ).collect():
                eng_m.setdefault(int(r["doc_id"]), []).append(
                    (r["words"], int(r["start_pos"]), int(r["end_pos"])))
            eng_h = {int(r["doc_id"]): r["headline"] for r in
                     ts_semantic_headline(df, cq).collect()}
            for did, content in enumerate(docs):
                n_cases += 1
                rm = ref_matches(sock, int(port), config, content, qtext)
                rh = ref_headline(sock, int(port), config, content, qtext)
                if isinstance(rm, tuple) or isinstance(rh, tuple):
                    ref_err += 1
                    continue
                em = sorted(eng_m.get(did, []))
                eh = eng_h.get(did)
                if em == rm and eh != rh \
                        and _is_c_locale_umlaut_artifact(eh, rh):
                    artifacts += 1
                    continue
                if em != rm or eh != rh:
                    mism += 1
                    if mism <= 6:
                        print("DIVERGENCE")
                        print("  doc:    ", repr(content[:90]))
                        print("  query:  ", qtext)
                        if em != rm:
                            print("  matches: engine", em)
                            print("           ref   ", rm)
                        if eh != rh:
                            print("  headline engine", repr(eh))
                            print("           ref   ", repr(rh))
        print(f"cases: {n_cases}  divergences: {mism}  "
              f"reference-errors(skipped): {ref_err}  "
              f"c-locale-umlaut-artifacts: {artifacts}")
        return 0 if mism == 0 else 1
    finally:
        if cleanup:
            cleanup()


if __name__ == "__main__":
    raise SystemExit(main())
