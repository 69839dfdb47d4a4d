"""Stage 2 — triple extraction: chunks → raw responses (actor pool).

The extraction stage mirrors the reference's ``TripleGenerator``
contract (``src/core/Generator/TripleGenerator.py:61-146``): heavy state
(model + tokenizer, prompt templates) is loaded ONCE per worker in
``__init__`` and each ``__call__`` maps one Arrow batch of chunks to the
same batch plus a ``response`` string column.  Two interchangeable
implementations:

* ``DeterministicTripleExtractor`` — rule-based, fully deterministic;
  the implementation used by tests, fixtures and benches (SURVEY.md
  §7.4: the P/R≥0.95 gate must not depend on re-running an LLM);
* ``HFTripleExtractor`` — real ``transformers`` causal-LM path with
  batched generate, import-gated (the sandbox has no model downloads;
  on a real cluster it drops in with ``num_gpus`` per actor).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.extract_rules import extract_triples, render_response

DEFAULT_SYSTEM_MESSAGE = (
    "Extract RDF triples from the following text. "
    "Each triple should be of the form (subject, predicate, object)."
)
DEFAULT_PROMPT_TEMPLATE = "Generate triples for the following text:\n{text}"


def generate_prompt(system_message: str, prompt_template: str, text: str) -> str:
    """Prompt formatting (M5, ``TripleGenerator.py:100-115``)."""
    return f"{system_message}\n{prompt_template.format(text=text)}"


def _extract_batch(batch: pa.Table) -> pa.Table:
    texts = batch["chunk_text"].to_pylist()
    langs = batch["lang"].to_pylist()
    responses = [
        render_response(extract_triples(t or "", lang)) for t, lang in zip(texts, langs)
    ]
    return batch.append_column("response", pa.array(responses, pa.string()))


class DeterministicTripleExtractor:
    """Rule-based 'model': emits numbered ``i. (s, p, o)`` lines like an
    instruction-following LLM answering the reference prompt.  The rules
    are module-level compiled regexes — no per-actor state — so the
    stage normally runs as a task pool (elastic, no pool spin-up);
    this class exists for contract parity with ``HFTripleExtractor``."""

    def __init__(
        self,
        system_message: str = DEFAULT_SYSTEM_MESSAGE,
        prompt_template: str = DEFAULT_PROMPT_TEMPLATE,
    ):
        self.system_message = system_message
        self.prompt_template = prompt_template

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _extract_batch(batch)


class HFTripleExtractor:
    """HuggingFace causal-LM extractor (ST1 re-expressed).  Loads
    tokenizer+model once per actor; generates per batch; strips the
    prompt prefix (M6).  Raises ImportError in environments without
    ``transformers`` — gate with a config flag."""

    def __init__(
        self,
        model_name: str,
        system_message: str = DEFAULT_SYSTEM_MESSAGE,
        prompt_template: str = DEFAULT_PROMPT_TEMPLATE,
        max_new_tokens: int = 512,
    ):
        import torch  # noqa: F401  (import-gated heavy deps)
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModelForCausalLM.from_pretrained(model_name)
        self.system_message = system_message
        self.prompt_template = prompt_template
        self.max_new_tokens = max_new_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        prompts = [
            generate_prompt(self.system_message, self.prompt_template, t)
            for t in batch["chunk_text"].to_pylist()
        ]
        inputs = self.tokenizer(prompts, return_tensors="pt", padding=True)
        outputs = self.model.generate(
            **inputs,
            max_new_tokens=self.max_new_tokens,
            pad_token_id=self.tokenizer.eos_token_id,
        )
        decoded = self.tokenizer.batch_decode(outputs, skip_special_tokens=True)
        responses = [d[len(p) :] for d, p in zip(decoded, prompts)]
        return batch.append_column("response", pa.array(responses, pa.string()))


def generate_responses(
    ds: ray.data.Dataset,
    extractor: str = "deterministic",
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 256,
    model_name: str | None = None,
    num_gpus: float | None = None,
    **extractor_kwargs,
) -> ray.data.Dataset:
    """chunks → chunks+response.

    The deterministic extractor is stateless → task-pool map_batches
    (elastic scheduling, no actor startup).  The HF model extractor is
    heavy warm state → autoscaling actor pool with per-actor model load
    in ``__init__`` (ST1 re-expressed)."""
    if extractor == "deterministic":
        return ds.map_batches(_extract_batch, batch_format="pyarrow", batch_size=None)
    if extractor == "hf":
        extractor_kwargs["model_name"] = model_name
        ray_remote_args = {}
        if num_gpus:
            ray_remote_args["num_gpus"] = num_gpus
        return ds.map_batches(
            HFTripleExtractor,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs=extractor_kwargs,
            **ray_remote_args,
        )
    raise ValueError(f"unknown extractor: {extractor}")
