"""Evaluation metrics — the reference's test-harness math, re-typed.

* ``strict_match`` — set-based triple P/R/F1, the definition of the
  P/R≥0.95 agreement gate (reference
  ``tests/test_modules/metrics_generator.py:104-126``, E3).
* ``relaxed_match`` — normalized per-component containment
  (``metrics_generator.py:128-157``, E4; quadratic, fixture-scale only).
* ``evaluate_ids`` — per-component id-level P/R/F1 over matched records
  (``tests/test_modules/metrics.py:78-115``, E1/E2; list-membership
  semantics, duplicates counted per occurrence).

Driver-side helpers for pytest — not Dataset stages (SURVEY.md §2.6).
"""

from __future__ import annotations

from .functions.grammar import normalize_text

Triple = tuple[str, str, str]


def _prf(tp: int, fp: int, fn: int) -> dict:
    precision = tp / (tp + fp) if tp + fp > 0 else 0
    recall = tp / (tp + fn) if tp + fn > 0 else 0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall > 0 else 0
    return {
        "Precision": precision,
        "Recall": recall,
        "F1": f1,
        "True Positives": tp,
        "False Positives": fp,
        "False Negatives": fn,
    }


def strict_match(generated: list[Triple], ground_truth: list[Triple]) -> dict:
    gen, gt = set(map(tuple, generated)), set(map(tuple, ground_truth))
    return _prf(len(gen & gt), len(gen - gt), len(gt - gen))


def relaxed_match(generated: list[Triple], ground_truth: list[Triple]) -> dict:
    gen_n = [tuple(normalize_text(c) for c in t) for t in generated]
    gt_n = [tuple(normalize_text(c) for c in t) for t in ground_truth]
    # NB: `c in g` with g a tuple is *component membership* (exact
    # normalized equality with any component), matching the reference's
    # expression at metrics_generator.py:141 precisely.
    tp = sum(any(all(c in g for c in t if c) for g in gen_n) for t in gt_n)
    fn = len(gt_n) - tp
    fp = len(gen_n) - tp
    return _prf(tp, fp, fn)


def rouge_match(generated: list[Triple], ground_truth: list[Triple]) -> dict:
    """E5 (``metrics_generator.py:159-183``): best-pair ROUGE-1/2/L per
    generated triple.  Import-gated — ``rouge_score`` is not in this
    environment; raises ImportError with the reference semantics
    documented."""
    from rouge_score import rouge_scorer  # noqa: F401  (import-gated)

    scorer = rouge_scorer.RougeScorer(["rouge1", "rouge2", "rougeL"], use_stemmer=True)
    totals = {"rouge1": 0.0, "rouge2": 0.0, "rougeL": 0.0}
    for gen in generated:
        best = {k: 0.0 for k in totals}
        for gt in ground_truth:
            scores = scorer.score(" ".join(gen), " ".join(gt))
            for k in totals:
                best[k] = max(best[k], scores[k].fmeasure)
        for k in totals:
            totals[k] += best[k]
    n = len(generated) or 1
    return {f"Average ROUGE-{k[5:].upper()}": v / n for k, v in totals.items()}


def bert_score_match(generated: list[Triple], ground_truth: list[Triple]) -> dict:
    """E5 (``metrics_generator.py:185-200``): corpus BERTScore.
    Import-gated — ``bert_score`` is not in this environment."""
    from bert_score import score as bert_score  # noqa: F401  (import-gated)

    gen_texts = [" ".join(t) for t in generated]
    gt_texts = [" ".join(t) for t in ground_truth]
    precision, recall, f1 = bert_score(gen_texts, gt_texts, lang="en", verbose=False)
    return {
        "Average BERTScore Precision": precision.mean().item(),
        "Average BERTScore Recall": recall.mean().item(),
        "Average BERTScore F1": f1.mean().item(),
    }


def evaluate_ids(
    generated_ids: list[Triple], ground_truth_ids: list[Triple]
) -> dict[str, dict]:
    """Per-component (subject/predicate/object) list-membership P/R/F1."""
    out = {}
    for i, name in enumerate(("subjects", "predicates", "objects")):
        gen = [t[i] for t in generated_ids]
        gt = list(t[i] for t in ground_truth_ids)
        remaining = list(gt)
        tp = 0
        for g in gen:
            if g in remaining:
                tp += 1
                remaining.remove(g)
        fp = len(gen) - tp
        fn = len(remaining)
        out[name] = _prf(tp, fp, fn)
    return out
