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


def _rouge_tokens(text: str) -> list[str]:
    """rouge_score's default tokenization: lowercase, [a-z0-9]+ runs."""
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def _f_measure(overlap: int, n_gen: int, n_gt: int) -> float:
    if overlap == 0 or n_gen == 0 or n_gt == 0:
        return 0.0
    p, r = overlap / n_gen, overlap / n_gt
    return 2 * p * r / (p + r)


def _rouge_n(gen: list[str], gt: list[str], n: int) -> float:
    from collections import Counter

    g1 = Counter(tuple(gen[i : i + n]) for i in range(len(gen) - n + 1))
    g2 = Counter(tuple(gt[i : i + n]) for i in range(len(gt) - n + 1))
    overlap = sum(min(c, g2[k]) for k, c in g1.items())
    return _f_measure(overlap, sum(g1.values()), sum(g2.values()))


def _rouge_l(gen: list[str], gt: list[str]) -> float:
    if not gen or not gt:
        return 0.0
    # O(len(gen)·len(gt)) LCS with a rolling row
    prev = [0] * (len(gt) + 1)
    for x in gen:
        cur = [0]
        for j, y in enumerate(gt, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return _f_measure(prev[-1], len(gen), len(gt))


def _rouge_scores_pure(gen_text: str, gt_text: str) -> dict[str, float]:
    g, t = _rouge_tokens(gen_text), _rouge_tokens(gt_text)
    return {
        "rouge1": _rouge_n(g, t, 1),
        "rouge2": _rouge_n(g, t, 2),
        "rougeL": _rouge_l(g, t),
    }


def rouge_match(generated: list[Triple], ground_truth: list[Triple]) -> dict:
    """E5 (``metrics_generator.py:159-183``): best-pair ROUGE-1/2/L per
    generated triple, averaged.

    Uses ``rouge_score`` (``use_stemmer=True``, the reference's
    configuration) when the library is importable; otherwise a
    pure-Python fallback with the same tokenizer and f-measures but NO
    Porter stemming (documented divergence: inflected-word matches that
    stemming would unify score lower; tokens ≤ 3 chars are unaffected
    either way since rouge_score only stems longer tokens)."""
    try:  # pragma: no cover - library absent in this environment
        from rouge_score import rouge_scorer

        scorer = rouge_scorer.RougeScorer(
            ["rouge1", "rouge2", "rougeL"], use_stemmer=True
        )
        # the reference's exact call order (metrics_generator.py:168):
        # score(<generated>, <ground truth>); all three f-measures are
        # symmetric in the pair, so the fallback matches either way
        score_pair = lambda a, b: {
            k: v.fmeasure for k, v in scorer.score(a, b).items()
        }
    except ImportError:
        score_pair = _rouge_scores_pure

    totals = {"rouge1": 0.0, "rouge2": 0.0, "rougeL": 0.0}
    for gen in generated:
        best = {k: 0.0 for k in totals}
        for gt in ground_truth:
            scores = score_pair(" ".join(gen), " ".join(gt))
            for k in totals:
                best[k] = max(best[k], scores[k])
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
