"""Stage 4 — entity/property linking against the broadcast dictionary.

Replaces the reference's per-triple Wikidata API lookups + mutable memo
caches (``src/core/Integrator/Matcher.py:44-172``, ST3) with pure
functions of the surface form over a frozen broadcast dictionary — the
semantics-preserving rewrite of first-wins memoization once the lookup
side is frozen (SURVEY.md §4.3.2).

Two strategies:

* **broadcast** (default): the dictionary is ``ray.put`` once; each
  linker actor builds its lookup structures in ``__init__`` and every
  batch is resolved with O(1) exact lookups — *zero shuffles*.  The
  cosine property path memoizes per-actor on distinct predicate
  surfaces so each actor encodes a surface at most once.
* **shuffle**: distinct surface forms are computed with a
  local-dedup → groupby two-phase (the salted/partial pattern: the
  per-batch dedup caps any hot key's shuffle volume at one row per
  block), resolved once per distinct key, and hash-joined back.  This
  is the scale path for when per-key resolution is expensive (real
  encoder) or the dictionary outgrows the object store.

Method enum replicates ``Matcher.query_wikidata_property``
(``Matcher.py:113-172``): ``api`` (exact label/alias else nothing),
``cos_similarity`` (embedding best-match always answers), ``mixed``
(exact first, cosine fallback); invalid method → ValueError.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..functions.embedding import encode_batch
from ..sources.alias_dict import ResolvedDict

VALID_METHODS = ("api", "cos_similarity", "mixed")


def _materialize_dict(dict_ref) -> pa.Table:
    if isinstance(dict_ref, ray.ObjectRef):
        return ray.get(dict_ref)
    return dict_ref


# Per-worker-process cache of built lookup structures, keyed by the
# broadcast object id.  Worker processes persist across map tasks, so a
# task-pool linker pays the (already tiny) build cost once per worker —
# actor-pool semantics without actor-pool startup latency.
_RESOLVED_CACHE: dict[tuple, "ResolvedDict"] = {}


def get_resolved(dict_ref, use_aliases: bool = True) -> ResolvedDict:
    key = (
        dict_ref.hex() if isinstance(dict_ref, ray.ObjectRef) else id(dict_ref),
        use_aliases,
    )
    rd = _RESOLVED_CACHE.get(key)
    if rd is None:
        rd = ResolvedDict(_materialize_dict(dict_ref), use_aliases)
        rd._prop_memo = {}
        _RESOLVED_CACHE[key] = rd
    return rd


def resolve_properties(
    rd: ResolvedDict, predicates: list[str], method: str
) -> list[str | None]:
    """Property resolution with the reference's method dispatch
    (``Matcher.py:113-172``), memoized per distinct surface on ``rd``."""
    memo = rd._prop_memo
    out: list[str | None] = [None] * len(predicates)
    need_cos: dict[str, list[int]] = {}
    for i, pred in enumerate(predicates):
        if pred in memo:
            out[i] = memo[pred]
            continue
        exact = rd.resolve("property", pred) if method in ("api", "mixed") else None
        if exact is not None or method == "api":
            memo[pred] = exact
            out[i] = exact
        else:  # cos_similarity always scores; mixed falls through on miss
            need_cos.setdefault(pred, []).append(i)
    if need_cos:
        distinct = list(need_cos.keys())
        vecs = encode_batch(distinct)
        topk = rd.top_k_properties(vecs, k=10)
        for pred, matches in zip(distinct, topk):
            best = matches[0][0] if matches else None
            memo[pred] = best
            for i in need_cos[pred]:
                out[i] = best
    return out


def _link_batch(
    batch: pa.Table, dict_ref, method: str, use_aliases: bool
) -> pa.Table:
    rd = get_resolved(dict_ref, use_aliases)
    subjects = batch["subject"].to_pylist()
    predicates = batch["predicate"].to_pylist()
    objects = batch["object"].to_pylist()
    subject_ids = [rd.resolve("entity", s) for s in subjects]
    object_ids = [rd.resolve("entity", o) for o in objects]
    predicate_ids = resolve_properties(rd, predicates, method)
    is_literal = [oid is None for oid in object_ids]
    return (
        batch.append_column("subject_id", pa.array(subject_ids, pa.string()))
        .append_column("predicate_id", pa.array(predicate_ids, pa.string()))
        .append_column("object_id", pa.array(object_ids, pa.string()))
        .append_column("is_literal", pa.array(is_literal, pa.bool_()))
    )


class LinkerActor:
    """Per-batch linker: subject/object entity resolution + predicate
    property resolution.  Dictionary read from the object store once per
    actor (broadcast, not per batch)."""

    def __init__(self, dict_ref, method: str = "api", use_aliases: bool = True):
        if method not in VALID_METHODS:
            raise ValueError(
                f"Invalid method: {method}. Use 'api', 'cos_similarity', or 'mixed'."
            )
        self.rd = ResolvedDict(_materialize_dict(dict_ref), use_aliases)
        self.method = method
        self._prop_memo: dict[str, str | None] = {}

    def _resolve_properties(self, predicates: list[str]) -> list[str | None]:
        self.rd._prop_memo = self._prop_memo
        return resolve_properties(self.rd, predicates, self.method)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjects = batch["subject"].to_pylist()
        predicates = batch["predicate"].to_pylist()
        objects = batch["object"].to_pylist()
        subject_ids = [self.rd.resolve("entity", s) for s in subjects]
        object_ids = [self.rd.resolve("entity", o) for o in objects]
        predicate_ids = self._resolve_properties(predicates)
        is_literal = [oid is None for oid in object_ids]
        return (
            batch.append_column("subject_id", pa.array(subject_ids, pa.string()))
            .append_column("predicate_id", pa.array(predicate_ids, pa.string()))
            .append_column("object_id", pa.array(object_ids, pa.string()))
            .append_column("is_literal", pa.array(is_literal, pa.bool_()))
        )


def link_triples(
    ds: ray.data.Dataset,
    dict_ref,
    method: str = "api",
    use_aliases: bool = True,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """triples → linked triples (broadcast strategy, shuffle-free).

    Task-pool: the broadcast dictionary is fetched zero-copy from the
    object store and its lookup structures cached per worker process
    (``get_resolved``), so tasks schedule elastically with warm-state
    economics.  ``concurrency`` is accepted for API compatibility with
    the actor-pool variant (used when a real encoder model makes the
    per-worker state genuinely heavy)."""
    return ds.map_batches(
        _link_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_kwargs={
            "dict_ref": dict_ref,
            "method": method,
            "use_aliases": use_aliases,
        },
    )


def _melt_surfaces(batch: pa.Table) -> pa.Table:
    """Triple batch → locally-deduped (kind, surface) rows."""
    seen: set[tuple[str, str]] = set()
    for s in batch["subject"].to_pylist():
        seen.add(("entity", s))
    for o in batch["object"].to_pylist():
        seen.add(("entity", o))
    for p in batch["predicate"].to_pylist():
        seen.add(("property", p))
    kinds = [k for k, _ in seen]
    surfaces = [s for _, s in seen]
    return pa.table(
        {"kind": pa.array(kinds, pa.string()), "surface": pa.array(surfaces, pa.string())}
    )


def distinct_surfaces(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Distributed distinct of surface forms: per-batch local dedup (the
    partial/combiner phase — caps hot-key shuffle volume at one row per
    block) then a global groupby.  Columns: (kind, surface)."""
    melted = ds.map_batches(_melt_surfaces, batch_format="pyarrow")
    distinct = melted.groupby(["kind", "surface"]).count()
    return distinct.drop_columns(["count()"])


class SurfaceResolverActor:
    """Resolve distinct (kind, surface) rows → resolved_id (shuffle
    strategy's per-key resolution; runs once per distinct key)."""

    def __init__(self, dict_ref, method: str = "api", use_aliases: bool = True):
        self.inner = LinkerActor(dict_ref, method, use_aliases)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        surfaces = batch["surface"].to_pylist()
        ids: list[str | None] = []
        ent_idx = [i for i, k in enumerate(kinds) if k == "entity"]
        prop_idx = [i for i, k in enumerate(kinds) if k == "property"]
        ids = [None] * len(kinds)
        for i in ent_idx:
            ids[i] = self.inner.rd.resolve("entity", surfaces[i])
        prop_ids = self.inner._resolve_properties([surfaces[i] for i in prop_idx])
        for i, pid in zip(prop_idx, prop_ids):
            ids[i] = pid
        return batch.append_column("resolved_id", pa.array(ids, pa.string()))


def link_triples_shuffle(
    ds: ray.data.Dataset,
    dict_ref,
    method: str = "api",
    use_aliases: bool = True,
    concurrency: int | tuple[int, int] = (1, 4),
    num_partitions: int | None = None,
    stepwise: bool = False,
) -> ray.data.Dataset:
    """Shuffle strategy: distinct surfaces → resolve once per key →
    three hash joins back onto (subject, predicate, object).

    ``stepwise=True`` materializes between the joins so only one
    hash-shuffle's aggregators exist at a time — required on tiny
    clusters (measured: at 4 CPUs the concurrent aggregator
    ``request_resources`` of stacked joins deadlocks); on real clusters
    leave it off and let the joins pipeline."""
    from .relational import partitions_for

    if num_partitions is None:
        # scale the three link-back joins with the cluster (joins pin a
        # CPU per aggregator — a fraction of the cores, not all)
        num_partitions = partitions_for(scale=0.5, minimum=8)
    resolved = distinct_surfaces(ds).map_batches(
        SurfaceResolverActor,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={
            "dict_ref": dict_ref,
            "method": method,
            "use_aliases": use_aliases,
        },
    )
    if stepwise:
        resolved = resolved.materialize()
        ds = ds.materialize()
    ents = resolved.filter(expr="kind == 'entity'").drop_columns(["kind"])
    props = resolved.filter(expr="kind == 'property'").drop_columns(["kind"])

    out = ds.join(
        ents.rename_columns({"surface": "subject", "resolved_id": "subject_id"}),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("subject",),
    )
    if stepwise:
        out = out.materialize()
    out = out.join(
        props.rename_columns({"surface": "predicate", "resolved_id": "predicate_id"}),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("predicate",),
    )
    if stepwise:
        out = out.materialize()
    out = out.join(
        ents.rename_columns({"surface": "object", "resolved_id": "object_id"}),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("object",),
    )

    def _stamp_literal(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column("is_literal", pc.is_null(batch["object_id"]))

    return out.map_batches(_stamp_literal, batch_format="pyarrow")
