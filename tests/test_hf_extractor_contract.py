"""Contract test for the HF model extractor using stub torch /
transformers modules: verifies the batched prompt → generate → decode →
prompt-strip plumbing (ST1/M5/M6) without the real libraries."""

import sys
import types

import pyarrow as pa


class _StubTokenizer:
    eos_token_id = 0

    def __call__(self, prompts, return_tensors=None, padding=None):
        return {"prompts": list(prompts)}

    def batch_decode(self, outputs, skip_special_tokens=True):
        return outputs

    @classmethod
    def from_pretrained(cls, name):
        return cls()


class _StubModel:
    @classmethod
    def from_pretrained(cls, name):
        return cls()

    def generate(self, prompts=None, max_new_tokens=None, pad_token_id=None):
        # echo the prompt + a deterministic 'completion'
        return [p + "\n1. (Stub, answered, prompt)" for p in prompts]


def test_hf_extractor_plumbing(monkeypatch):
    torch_stub = types.ModuleType("torch")
    tf_stub = types.ModuleType("transformers")
    tf_stub.AutoTokenizer = _StubTokenizer
    tf_stub.AutoModelForCausalLM = _StubModel
    monkeypatch.setitem(sys.modules, "torch", torch_stub)
    monkeypatch.setitem(sys.modules, "transformers", tf_stub)

    from knowledge_graph_creation_from_text_with_llms_ray.stages.extract import (
        HFTripleExtractor,
    )

    actor = HFTripleExtractor(model_name="stub-model")
    batch = pa.table(
        {
            "chunk_text": ["some chunk text", "another chunk"],
            "lang": ["text", "text"],
        }
    )
    out = actor(batch)
    responses = out["response"].to_pylist()
    # the prompt prefix must be stripped (M6, TripleGenerator.py:140-141)
    assert responses == ["\n1. (Stub, answered, prompt)"] * 2

    from knowledge_graph_creation_from_text_with_llms_ray.functions.grammar import (
        extract_triples_from_response,
    )

    assert extract_triples_from_response(responses[0]) == [("Stub", "answered", "prompt")]
