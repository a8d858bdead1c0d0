"""Value-system parity: our vectorized classifier vs the reference's
KgtkValue.classify on a generated corpus of tricky values.

Imports the reference from /root/reference (with the same stub modules
as scripts/bench_reference.py), classifies every value both ways, and
reports agreement + any disagreements.  Exits nonzero on disagreement.

Usage: python scripts/check_values_vs_reference.py
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.bench_reference import SHIM, make_shims  # noqa: E402

VALUES = [
    # empty / lists
    "", "a|b|c", "a\\|b", "|", "x|",
    # numbers
    "0", "1", "-1", "+17", "3.14", "-2.5e10", "+1E-3", ".5", "0x1F",
    "0o17", "0b101", "1_000", "nan",
    # quantities
    "10m", "-1.2e+2[-1.0,+1.0]kg.m/s2", "+17.2Q494083", "5[4,6]m",
    "12kg", "1.5e3Q11573", "10mm2", "3s",
    # strings
    '"hello"', '"with \\"escape\\""', '"unterminated', '"tab\\there"',
    '""', '"|pipe|"',
    # language-qualified strings
    "'hi'@en", "'x'@en-GB", "'multi word'@de", "'bad'@", "'no-lang'",
    "'suffix'@zh-Hans",
    # coordinates
    "@043.26193/010.92708", "@-90.0/180.0", "@91.0/0.0", "@0/0",
    "@+40.75/-074.00",
    # dates
    "^1839-00-00T00:00:00Z/9", "^2020-01-01", "^2020-01-01T12:34:56Z",
    "^1999-12-31T23:59:59+05:30/11", "^0000-01-01", "^2020",
    "^2020-13-01", "^20200101T120000Z",
    # boolean / extension / symbols
    "True", "False", "true", "!ext", "Q42", "P31", "some_symbol",
    "with space", "née", "12ab", "Q42|Q43",
]


def fuzz_values(n: int, seed: int = 7) -> list[str]:
    """Deterministic random KGTK-ish values exercising every sigil."""
    import random
    rng = random.Random(seed)
    sigils = ['"', "'", "@", "^", "!", "", "+", "-", "."]
    alphabet = 'abcXYZ019 .|\\/@^"\'-+_[],eE'
    out = []
    for _ in range(n):
        body = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        out.append(rng.choice(sigils) + body)
        if rng.random() < 0.3:
            num = f"{rng.choice(['', '+', '-'])}{rng.randint(0, 999)}"
            unit = rng.choice(["", "m", "kg.m/s2", "mm", "Q42", "Q0",
                               f"[{rng.randint(-5, 0)},{rng.randint(0, 5)}]m"])
            out.append(num + unit)
    return out


# Option-sensitive extra values: lax strings/lq-strings, wikidata lang
# suffixes, month/day zero, end-of-day 24:00, lax/out-of-range
# coordinates, year clamps, lax qnode units.
OPTION_VALUES = [
    '"unescaped "quote""', '"newline\nin string"',
    "'unescaped 'quote''@en", "'x'@en-GB-oed", "'x'@nan-x-hokkien",
    "'x'@zho", "'y'@q", "'long'@classicalchinese",
    "^1839-00-00T00:00:00Z/9", "^1839-05-00", "^1839-00-15",
    "^2020-01-01T24:00:00", "^2020-01-01T24:00:01", "^2020-01-01T24:30",
    "^1500-01-01", "^0500-01-01", "^2200-01-01", "^9999-12-31",
    "@1.5e1/-3.0e1", "@95.0/0.0", "@-95.0/0.0", "@0.0/200.0",
    "@0.0/-200.0", "@0.0/560.0",
    "17Q42_b", "17Qabc", "3.5Q-1", "12Q007",
]

_OPTION_COMBOS = [
    {},
    {"allow_lax_strings": True},
    {"allow_lax_lq_strings": True},
    {"allow_wikidata_lq_strings": True},
    {"allow_lax_qnodes": True},
    {"allow_month_or_day_zero": True},
    {"repair_month_or_day_zero": True},
    {"allow_end_of_day": False},
    {"allow_lax_coordinates": True},
    {"repair_lax_coordinates": True},
    {"allow_out_of_range_coordinates": True},
    {"clamp_minimum_lat": True, "clamp_maximum_lat": True,
     "clamp_minimum_lon": True, "clamp_maximum_lon": True},
    {"modulo_repair_lon": True},
    {"clamp_minimum_year": True, "clamp_maximum_year": True},
    {"ignore_minimum_year": True, "ignore_maximum_year": True},
    {"minimum_valid_year": 1900, "maximum_valid_year": 2000,
     "clamp_minimum_year": True},
    {"repair_month_or_day_zero": True, "modulo_repair_lon": True,
     "allow_lax_strings": True, "allow_wikidata_lq_strings": True,
     "clamp_maximum_year": True, "repair_lax_coordinates": True},
]


def main() -> int:
    make_shims()
    sys.path.insert(0, SHIM)
    sys.path.insert(0, "/root/reference")
    from kgtk.value.kgtkvalue import KgtkValue
    from kgtk.value.kgtkvalueoptions import KgtkValueOptions

    from kgtk_ray.values import (ValueOptions, classify, validate,
                                 validate_with_options)

    corpus = VALUES + fuzz_values(2000)
    opts = KgtkValueOptions()
    ref_types, ref_valid = [], []
    for v in corpus:
        kv = KgtkValue(v, options=opts)
        ref_types.append(kv.classify().name.lower())
        ref_valid.append(bool(KgtkValue(v, options=opts).validate()))

    ours_t = classify(corpus)
    ours_v = validate(corpus)
    bad_t = [(v, r, o) for v, r, o in zip(corpus, ref_types, ours_t) if r != o]
    bad_v = [(v, r, bool(o)) for v, r, o in zip(corpus, ref_valid, ours_v)
             if r != bool(o)]
    n = len(corpus)
    print(f"classify: {n}  agree: {n - len(bad_t)}  disagree: {len(bad_t)}")
    print(f"validate: {n}  agree: {n - len(bad_v)}  disagree: {len(bad_v)}")
    for v, r, o in (bad_t + bad_v)[:40]:
        print(f"  {v!r}: reference={r} ours={o}")

    # --- option-matrix parity: validity AND post-repair value ---
    opt_corpus = VALUES + OPTION_VALUES + fuzz_values(1000, seed=13)
    total_bad = 0
    for combo in _OPTION_COMBOS:
        ref_opts = KgtkValueOptions(**combo)
        ref_ok, ref_val = [], []
        for v in opt_corpus:
            kv = KgtkValue(v, options=ref_opts)
            ref_ok.append(bool(kv.validate()))
            ref_val.append(kv.value)
        ok, repaired = validate_with_options(opt_corpus,
                                            ValueOptions(**combo))
        bad = [
            (v, (r, rv), (bool(o), rp))
            for v, r, rv, o, rp in zip(opt_corpus, ref_ok, ref_val, ok,
                                       repaired)
            if r != bool(o) or (r and rv != rp)
        ]
        total_bad += len(bad)
        label = ",".join(f"{k}={v}" for k, v in combo.items()) or "defaults"
        print(f"options[{label}]: {len(opt_corpus)} values, "
              f"disagree: {len(bad)}")
        for v, r, o in bad[:10]:
            print(f"  {v!r}: reference={r} ours={o}")

    return 1 if (bad_t or bad_v or total_bad) else 0


if __name__ == "__main__":
    sys.exit(main())
