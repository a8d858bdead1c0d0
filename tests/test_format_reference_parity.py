"""Fuzz parity of kgtk_ray.format string helpers against the
reference's own KgtkFormat / KgtkValue classmethods, imported directly
as the oracle (they are dependency-free)."""
import random
import sys
import types

import pytest

_inserted = []
for mod, src in {
    "sh": "class ErrorReturnCode(Exception): pass\n"
          "class SignalException(Exception): pass\n"
          "class CommandNotFound(Exception): pass\n",
    "iso639": "def languages(*a, **k):\n    return None\n"
              "def to_iso639_1(x):\n    return x\n"
              "class NonExistentLanguageError(Exception): pass\n",
    "pycountry": "class languages:\n"
                 "    @staticmethod\n"
                 "    def get(**k):\n        return None\n",
}.items():
    if mod not in sys.modules:
        m = types.ModuleType(mod)
        exec(src, m.__dict__)
        sys.modules[mod] = m
        _inserted.append(mod)
sys.path.insert(0, "/root/reference")
from kgtk.kgtkformat import KgtkFormat  # noqa: E402
from kgtk.value.kgtkvalue import KgtkValue  # noqa: E402

sys.path.remove("/root/reference")
for _mod in _inserted:  # don't leak stubs into later real imports
    sys.modules.pop(_mod, None)

from kgtk_ray.format import (join_list, join_sorted_unique,  # noqa: E402
                             split_list, stringify, unstringify)

_CHARS = list("ab|\\\"'\t\n xyz𝕊é,:^@0123456789")


def _rand_strings(n, seed):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 12)
        out.append("".join(rng.choice(_CHARS) for _ in range(k)))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_stringify_parity(seed):
    for s in _rand_strings(400, seed):
        assert stringify(s) == KgtkFormat.stringify(s), repr(s)


@pytest.mark.parametrize("seed", [4, 5])
def test_unstringify_roundtrip_parity(seed):
    # unstringify applied to reference-stringified values
    for s in _rand_strings(400, seed):
        v = KgtkFormat.stringify(s)
        assert unstringify(v) == KgtkFormat.unstringify(v), repr(v)


@pytest.mark.parametrize("seed", [6, 7])
def test_split_join_list_parity(seed):
    rng = random.Random(seed)
    for _ in range(300):
        items = [x.replace("|", "\\|")
                 for x in _rand_strings(rng.randint(1, 4), rng.random())]
        cell = join_list(items)
        assert cell == KgtkValue.join_list(items)
        if cell == "":
            # documented divergence: empty cell -> [] here, [''] there
            assert split_list(cell) == []
        else:
            assert split_list(cell) == KgtkValue.split_list(cell), repr(cell)
    # sorted-unique join
    vals = ["b", "a", "b", "c"]
    assert join_sorted_unique(vals) == KgtkValue.join_unique_list(vals)
