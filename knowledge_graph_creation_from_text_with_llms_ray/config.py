"""YAML-driven pipeline configuration.

Mirrors the reference's config surface (``src/config/main.yaml:1-89``
consumed by ``src/run.py:85-116``): data paths, chunking, prompts,
generation parameters, matching method — mapped onto ``KGConfig`` plus
run-level paths.  The reference's CLI advertises modes
``extractor/generator/integrator`` but tests ``extract/generate/
integrate`` (``run.py:153`` vs ``:85-116``), so only ``full`` ever ran;
this engine accepts BOTH spellings (documented fix, SURVEY.md §2.7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import yaml

from .pipelines.kg import KGConfig

MODE_ALIASES = {
    "full": "full",
    "extract": "extract",
    "extractor": "extract",
    "generate": "generate",
    "generator": "generate",
    "integrate": "integrate",
    "integrator": "integrate",
    # extension beyond the reference CLI: the corpus-curation pipeline
    "curate": "curate",
}


@dataclass
class RunConfig:
    input_path: str = ""
    workdir: str = "./kgray_out"
    mode: str = "full"
    kg: KGConfig = field(default_factory=KGConfig)
    raw: dict[str, Any] = field(default_factory=dict)


def load_config(path: str) -> RunConfig:
    with open(path, encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}

    paths = raw.get("data_paths", {})
    gen = raw.get("generator", {})
    integ = raw.get("integrator", {})
    matching = integ.get("matching_config", {})

    kg = KGConfig(
        chunk_size=int(raw.get("extractor", {}).get("chunk_size", 500)),
        max_chunks=gen.get("max_chunks"),
        extractor=gen.get("extractor", "deterministic"),
        model_name=gen.get("model_name"),
        property_query_method=matching.get("property_query_method", "api"),
        use_aliases=bool(matching.get("use_aliases", True)),
        link_strategy=integ.get("link_strategy", "broadcast"),
    )
    extra = {
        "system_message": gen.get("system_message"),
        "prompt_template": gen.get("prompt_template"),
        "save_matches": matching.get("save_matches", False),
        "matches_output_file": matching.get("matches_output_file", "matched_triples.yaml"),
        "properties_file": matching.get("properties_file"),
    }
    kg.extra = {k: v for k, v in extra.items() if v is not None}
    return RunConfig(
        input_path=paths.get("input_path", raw.get("input_path", "")),
        workdir=paths.get("output_path", raw.get("workdir", "./kgray_out")),
        mode=MODE_ALIASES.get(raw.get("mode", "full"), "full"),
        kg=kg,
        raw=raw,
    )
