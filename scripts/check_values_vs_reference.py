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


def main() -> int:
    make_shims()
    sys.path.insert(0, SHIM)
    sys.path.insert(0, "/root/reference")
    from kgtk.value.kgtkvalue import KgtkValue
    from kgtk.value.kgtkvalueoptions import KgtkValueOptions

    from kgtk_ray.values import classify

    opts = KgtkValueOptions()
    ref_types = []
    for v in VALUES:
        kv = KgtkValue(v, options=opts)
        ref_types.append(kv.classify().name.lower())

    ours = classify(VALUES)
    bad = []
    for v, r, o in zip(VALUES, ref_types, ours):
        if r != o:
            bad.append((v, r, o))
    n = len(VALUES)
    print(f"values: {n}  agree: {n - len(bad)}  disagree: {len(bad)}")
    for v, r, o in bad:
        print(f"  {v!r}: reference={r} ours={o}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
