#!/usr/bin/env python3
"""Cross-validate the engine's Snowball stemmers against a LIVE
PostgreSQL's own dictionaries (`ts_lexize('<lang>_stem', word)`) — the
strongest parity oracle available: not hand-traced goldens, the actual
reference implementation.

Usage: python scripts/validate_stemmers_pg.py [n_fuzz_words] [seed]

Spins up a throwaway PostgreSQL instance (initdb to a temp dir, unix
socket only, runs as an unprivileged user when invoked as root — PG
refuses root) if one is not already provided via PGV_SOCKET/PGV_PORT,
builds a vocabulary of every shipped stopword for the four languages
plus random accented fuzz words, and diffs `stem_*` against
`ts_lexize`. Exit 0 = zero mismatches. Stopword hits (ts_lexize → {})
are skipped: PG's built-in `<lang>_stem` dictionaries carry the
stopword files, while the engine checks stopwords a layer above the
stemmer (functions/lexize.py), so {} rows compare nothing.

Round-4 note: this harness found and pinned three real divergences —
German computed regions on the LOWERCASED string (undoing the
u/y-between-vowels consonant mark: 'jouer' must stem to 'jou'), English
step-1a/1b vowel tests lowercased the marked string (consonant-Y
counted as a vowel: 'ymrys' lost its s), and French step 2a treated the
ï-mark 'H' as an ordinary preceding non-vowel ('dëï' lost its ï). After
the fixes: 0 mismatches over ~9k words per language.
"""

import os
import random
import re
import shutil
import subprocess
import sys
import tempfile

PG_BIN = "/usr/lib/postgresql/15/bin"
TSEARCH = "/usr/share/postgresql/15/tsearch_data"
LANGS = ["english", "german", "french", "spanish",
         "portuguese", "italian", "russian", "dutch",
         "swedish", "norwegian", "danish"]

# per-language fuzz alphabets: the shared Latin-accented pool for the
# western European stemmers, plus the language's own specials; Cyrillic
# for Russian (ё included — PG's russian_stem must agree on it too)
_LATIN = "abcdefghijklmnopqrstuvwxyzéèêëàâîïôûùáíóúüñçäöß"
FUZZ_ALPHABET = {
    "english": _LATIN, "german": _LATIN, "french": _LATIN,
    "spanish": _LATIN,
    "portuguese": _LATIN + "ãõâêô",
    "italian": _LATIN + "àèìòù",
    "russian": "абвгдежзийклмнопрстуфхцчшщъыьэюяё",
    "dutch": _LATIN + "ij",
    "swedish": _LATIN + "åäö",
    "norwegian": _LATIN + "æåø",
    "danish": _LATIN + "æåø",
}


def _run(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def start_throwaway_pg():
    """Returns (socket_dir, port, cleanup_fn) for a fresh PG on a unix
    socket; raises RuntimeError when no usable postgres is found."""
    if not os.path.exists(f"{PG_BIN}/initdb"):
        raise RuntimeError("no PostgreSQL binaries at " + PG_BIN)
    d = tempfile.mkdtemp(prefix="pgv_stem_")
    port = 54411
    as_root = os.geteuid() == 0
    if as_root:
        shutil.chown(d, user="nobody")

        def sh(cmd):
            return _run(["su", "-s", "/bin/sh", "nobody", "-c", cmd],
                        cwd="/tmp")
    else:
        def sh(cmd):
            return _run(["sh", "-c", cmd], cwd="/tmp")

    r = sh(f"{PG_BIN}/initdb -D {d}/data -E UTF8 --no-locale")
    if r.returncode != 0:
        raise RuntimeError("initdb failed: " + r.stderr[-300:])
    r = sh(f"{PG_BIN}/pg_ctl -D {d}/data -l {d}/log "
           f"-o '-k {d} -p {port} -c listen_addresses=' start")
    if r.returncode != 0:
        raise RuntimeError("pg_ctl failed: " + r.stderr[-300:])

    def cleanup():
        sh(f"{PG_BIN}/pg_ctl -D {d}/data stop -m immediate")
        shutil.rmtree(d, ignore_errors=True)

    return d, port, cleanup


def pg_lexize(sock, port, dict_name, words):
    arr = "ARRAY[" + ",".join(
        "'" + w.replace("'", "''") + "'" for w in words) + "]"
    q = (f"SELECT w, COALESCE((ts_lexize('{dict_name}', w))[1], '<STOP>')"
         f" FROM unnest({arr}::text[]) AS t(w)")
    out = _run(["psql", "-h", sock, "-p", str(port), "-U",
                "nobody" if os.geteuid() == 0 else os.environ.get(
                    "USER", "postgres"),
                "postgres", "-t", "-A", "-F", "\t", "-c", q], cwd="/tmp")
    if out.returncode != 0:
        raise RuntimeError("psql failed: " + out.stderr[:300])
    res = {}
    for line in out.stdout.strip().splitlines():
        w, lx = line.split("\t")
        res[w] = None if lx == "<STOP>" else lx
    return res


# Suffix-seeded fuzz (round-5 hardening): pure-random letters almost
# never form real suffixes (P(4-char suffix) ~ 1e-6), which let two
# transcription bugs slip past 9k-word runs (Italian missing 'ere'/'ire',
# Swedish wrongly including 'elig' — both caught by the analyzer sweep's
# cross-language fragments instead). This pool is transcribed from the
# published algorithm pages INDEPENDENTLY of the engine's tables and is
# applied across ALL languages, so an engine list that dropped or
# invented a suffix gets exercised with realistic stems around it.
SUFFIX_POOL = """
ing ed ly ness ful ement ements ation ations ique isme able iste eux
euse ance ence ité ités ive ives eaux aux amment emment ment ments
heit keit ung lich ig isch end ern em er en es e s est elig eleg lig
leg els lov slov hetslov ig eig baar bar lijk heid heden ende ande
erte ert ast are arna erna orna aste heter heten hetens ornas ernas
arnas andet anden igst løst fullt dd gd nn dt gt kt tt ere ire are ar
ir azione azioni atore atori logia logie uzione usione enza enze
amento amenti imento imenti ità ivo ivi iva ive anza anze ichi iche
isti iste ismi ista oso osa osi ose abile ibile mente erò erà iscono
iamo ando endo ano ono uta ute uti uto ata ate ati ato eza ezas ico
ica icos icas ismo ismos ável ível istas osos osas amentos imentos
adora ador ação ções ança ância ências ência logía logías ución
uciones amente idade idades iras ira eis éis emos amos aron ieron
ado ido ando iendo ar er ía ían aba aban ase iese ara iera ería iría
ción ciones miento mientos dor dora dores doras ista istas ísimo
ov ев ов ие ье ами ями ой ей ий ый ом его ому ими ыми ую юю ая яя
ость ост ение ания ился ывать ивать ать ять еть уть ешь ется ются
вший вшись ующий ленно нный ская ский ское
""".split()


def build_vocab(n_fuzz, seed, lang):
    vocab = set()
    path = os.path.join(TSEARCH, f"{lang}.stop")
    if os.path.exists(path):
        vocab |= set(open(path, encoding="utf-8").read().split())
    # zlib.crc32, not hash(): str hash is salted per process, which made
    # identical invocations test different vocabularies
    import zlib
    rng = random.Random(seed + zlib.crc32(lang.encode()) % 1000)
    al = FUZZ_ALPHABET[lang]
    vocab |= {"".join(rng.choice(al)
                      for _ in range(rng.randint(1, 13)))
              for _ in range(n_fuzz)}
    # suffix-seeded words: random short stem + a real suffix from the
    # cross-language pool, so suffix-table transcription errors can't
    # hide behind (1/|alphabet|)^len odds
    vocab |= {"".join(rng.choice(al) for _ in range(rng.randint(2, 6)))
              + rng.choice(SUFFIX_POOL)
              for _ in range(max(n_fuzz // 3, 200))}
    # the divergences this harness has caught, pinned forever
    vocab |= {"jouer", "üâ", "él", "dëï", "ymrys", "continuellement",
              "chevaux", "niños", "bleibenden", "running"}
    if lang == "portuguese":
        vocab |= {"canções", "coração", "proposições", "emoções",
                  "habilidades", "nações", "lã", "põe", "você", "fáceis",
                  "guiìe", "cação", "raça", "faça", "quiçá"}
    if lang == "italian":
        vocab |= {"abbandonerò", "pubblicità", "qualità", "perché",
                  "città", "più", "laggiù", "mandargli", "vendendolo",
                  "crocchi", "crocchio", "funghi", "banche"}
    if lang == "russian":
        vocab |= {"важнейшими", "красивее", "насекомые", "выживший",
                  "подъезд", "объявление", "чёрный", "её", "жизнь",
                  "книгой", "стеной", "веснушчатый"}
    return sorted(w for w in vocab
                  if w and re.fullmatch(r"[^\s'_]+", w))


def main():
    n_fuzz = int(sys.argv[1]) if len(sys.argv) > 1 else 9000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 97
    from pg_ts_semantic_headline_spark.functions.stemmer_de import \
        stem_german
    from pg_ts_semantic_headline_spark.functions.stemmer_en import \
        stem_english
    from pg_ts_semantic_headline_spark.functions.stemmer_es import \
        stem_spanish
    from pg_ts_semantic_headline_spark.functions.stemmer_fr import \
        stem_french
    from pg_ts_semantic_headline_spark.functions.stemmer_it import \
        stem_italian
    from pg_ts_semantic_headline_spark.functions.stemmer_pt import \
        stem_portuguese
    from pg_ts_semantic_headline_spark.functions.stemmer_nl import \
        stem_dutch
    from pg_ts_semantic_headline_spark.functions.stemmer_ru import \
        stem_russian
    from pg_ts_semantic_headline_spark.functions.stemmer_scand import (
        stem_danish, stem_norwegian, stem_swedish)
    mine = {"english_stem": stem_english, "german_stem": stem_german,
            "french_stem": stem_french, "spanish_stem": stem_spanish,
            "portuguese_stem": stem_portuguese,
            "italian_stem": stem_italian, "russian_stem": stem_russian,
            "dutch_stem": stem_dutch,
            "swedish_stem": stem_swedish,
            "norwegian_stem": stem_norwegian,
            "danish_stem": stem_danish}
    only = os.environ.get("PGV_ONLY")
    if only:
        mine = {k: v for k, v in mine.items()
                if k.split("_")[0] in only.split(",")}

    sock, port = os.environ.get("PGV_SOCKET"), os.environ.get("PGV_PORT")
    cleanup = None
    if not sock:
        sock, port, cleanup = start_throwaway_pg()
    try:
        total = 0
        for dname, fn in mine.items():
            vocab = build_vocab(n_fuzz, seed, dname.split("_")[0])
            mm = []
            for i in range(0, len(vocab), 500):
                chunk = vocab[i:i + 500]
                pg = pg_lexize(sock, int(port), dname, chunk)
                for w in chunk:
                    exp = pg.get(w)
                    if exp is None:
                        continue
                    got = fn(w)
                    if got != exp:
                        mm.append((w, got, exp))
            total += len(mm)
            print(f"{dname}: {len(mm)} mismatches / {len(vocab)}")
            for w, g, e in mm[:20]:
                print(f"   {w!r}: mine={g!r} pg={e!r}")
        print("TOTAL mismatches:", total)
        return 0 if total == 0 else 1
    finally:
        if cleanup:
            cleanup()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
