"""build_sentence parity against the REFERENCE's own
attribute_to_sentence (kgtk/gt/embedding_utils.py:506), imported with
stub third-party deps and bound to a dummy self whose
get_real_label_name is identity."""
import itertools
import logging
import sys
import types

import pytest


def _reference_fn():
    inserted = []
    for mod, src in {
        "redis": "class Redis:\n    def __init__(self,*a,**k): pass\n",
        "pyrallel": "class ParallelProcessor:\n"
                    "    def __init__(self,*a,**k): pass\n",
        "tqdm": "def tqdm(x=None,*a,**k):\n    return x\n",
        "SPARQLWrapper": "class SPARQLWrapper:\n"
                         "    def __init__(self,*a,**k): pass\n"
                         "JSON = POST = URLENCODED = None\n",
        "sh": "class ErrorReturnCode(Exception): pass\n"
              "class SignalException(Exception): pass\n"
              "class CommandNotFound(Exception): pass\n",
        "sentence_transformers":
            "class SentenceTransformer:\n"
            "    def __init__(self,*a,**k): pass\n"
            "class SentencesDataset: pass\nclass LoggingHandler: pass\n"
            "class losses: pass\nclass models: pass\n",
    }.items():
        if mod not in sys.modules:
            m = types.ModuleType(mod)
            exec(src, m.__dict__)
            sys.modules[mod] = m
            inserted.append(mod)
    sys.path.insert(0, "/root/reference")
    try:
        from kgtk.gt.embedding_utils import EmbeddingVector
    finally:
        sys.path.remove("/root/reference")
        # drop the stubs so later REAL imports (e.g. the embedder's
        # sentence_transformers try-import) see the true environment
        for mod in inserted:
            sys.modules.pop(mod, None)

    class Dummy:
        _logger = logging.getLogger("ref")

        def get_real_label_name(self, x):
            return x

    return types.MethodType(EmbeddingVector.attribute_to_sentence, Dummy())


CASES = [
    {"label_properties": ["Alice"],
     "description_properties": ["a person"],
     "isa_properties": ["human", "researcher"],
     "has_properties_values": ["works at ISI"],
     "has_properties": ["age"]},
    {"isa_properties": ["human"]},
    {"label_properties": ["Bob"], "has_properties": ["email"]},
    {"label_properties": ["C"], "isa_properties": ["x||y"]},
    {"label_properties": ["D"],
     "isa_properties": ["instance of||gene"]},
    {"description_properties": ["only a description"]},
    {"has_properties_values": ["borders France", "borders Spain"]},
    {"label_properties": ["E"], "isa_properties": ["t"],
     "has_properties": ["p1"]},
    {},
]


@pytest.mark.parametrize("case", CASES)
def test_build_sentence_matches_reference(case):
    from kgtk_ray.pipelines.embed import build_sentence
    ref = _reference_fn()
    want = ref(dict(case))
    got = build_sentence(case.get("label_properties", []),
                         case.get("description_properties", []),
                         case.get("isa_properties", []),
                         case.get("has_properties_values", []),
                         case.get("has_properties", []))
    assert got == want
