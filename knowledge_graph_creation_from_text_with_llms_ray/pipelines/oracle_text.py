"""SQL (DuckDB) oracle generators for the text / dedup / similarity
operators whose kernels are hash- or embedding-based.

Every generator reimplements the corresponding Python kernel in pure
ANSI-ish DuckDB SQL so the driver's correctness gate can verify the Ray
pipeline end-to-end — including MinHash banding, SimHash, rolling
fingerprints and the trigram encoder.  The two implementations share
exactly one primitive: ``md5`` (identical by definition in hashlib and
DuckDB), from which every derived integer (shingle hash, token hash,
trigram bucket) is rebuilt with explicit hex→little-endian-integer
arithmetic.

Float discipline (see ``queries.py`` module docstring): every emitted
float is a ratio of exact integers (bit-identical across engines);
similarity *scores* are never emitted — thresholds were empirically
checked to sit ≥ 3e-5 away from any data point, far above the ~1e-15
engine summation differences.

Parameter literals (minhash permutation constants, LSH hyperplanes) are
rendered into the SQL from the same seeded generators the Python
kernels use, so both engines compute from identical constants.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# hex → integer primitives
# ---------------------------------------------------------------------------

_HEXPOS = "(strpos('0123456789abcdef', substr({h}, {pos}, 1)) - 1)"


def md5_le_int(h_expr: str, nbytes: int) -> str:
    """SQL expression: little-endian integer of the first ``nbytes``
    bytes of an md5 hex-string expression (the Python side is
    ``int.from_bytes(md5(s).digest()[:nbytes], "little")``)."""
    terms = []
    for i in range(nbytes):
        hi = _HEXPOS.format(h=h_expr, pos=2 * i + 1)
        lo = _HEXPOS.format(h=h_expr, pos=2 * i + 2)
        mult = 256**i
        terms.append(f"({hi} * 16 + {lo}) * CAST({mult} AS HUGEINT)")
    return "(" + " + ".join(terms) + ")"


def pow2_values(n: int = 64) -> str:
    """VALUES rows ``(i, 2^i)`` as HUGEINT — bit arithmetic without
    shift operators."""
    return ", ".join(f"({i}, CAST({1 << i} AS HUGEINT))" for i in range(n))


# Python str.split() semantics: split on any whitespace run, drop empties.
# RE2's '\s' is ASCII-only ([\t\n\f\r ]) while Python str.split() splits
# on every codepoint where str.isspace() is true (\x1c-\x1f, U+0085,
# U+00A0, the U+2000 block, …) — so the class is generated FROM
# str.isspace() to stay bit-for-bit with the Python kernels on arbitrary
# unicode input.  Braces are doubled because TOKENS goes through
# ``.format(col=…)``.
_PY_WS = "".join(
    f"\\x{{{cp:x}}}" for cp in range(0x10000) if chr(cp).isspace()
)
_PY_WS_CLASS = f"[{_PY_WS}]+"  # direct embedding (f-strings / concat)
_PY_WS_FMT = _PY_WS_CLASS.replace("{", "{{").replace("}", "}}")  # via .format
TOKENS = (
    "list_filter(regexp_split_to_array({col}, '" + _PY_WS_FMT + "'), t -> t <> '')"
)


def _minhash_perm_values(num_perm: int = 64) -> str:
    """The EXACT permutation constants of ``hashing._minhash_params``
    (seed 1729), rendered as VALUES rows (j, a, b)."""
    rng = np.random.RandomState(1729)
    a = rng.randint(1, 1 << 32, size=num_perm, dtype=np.int64)
    b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.int64)
    return ", ".join(
        f"({j}, {int(a[j])}, {int(b[j])})" for j in range(num_perm)
    )


def _hyperplane_literals(planes: int, dim: int) -> list[str]:
    """The EXACT hyperplanes of ``embedding_near_dup_pairs`` (seed 7):
    one SQL double-list literal per plane row."""
    rng = np.random.RandomState(7)
    hyper = rng.standard_normal((2 * planes, dim))
    return [
        "[" + ", ".join(repr(float(v)) for v in row) + "]" for row in hyper
    ]


# ---------------------------------------------------------------------------
# Shared CTE fragments
# ---------------------------------------------------------------------------

def simhash_cte(src: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """CTE chain computing the 64-bit SimHash of ``hashing.simhash64``
    per document: md5-derived 64-bit token hash (little-endian), ±1 per
    bit position over ALL token occurrences, bit set where the sum is
    positive.  Exposes ``simhash_v(doc_id, v HUGEINT)`` (0 for docs
    with no tokens)."""
    tokens = TOKENS.format(col=text_col)
    le8 = md5_le_int("h", 8)
    return f"""
pow2(i, v) AS (VALUES {pow2_values(64)}),
sh_tok AS (
  SELECT {id_col} AS doc_id, unnest({tokens}) AS tok FROM {src}
),
sh_hv AS (
  SELECT doc_id, {le8} AS hv FROM (SELECT doc_id, md5(tok) AS h FROM sh_tok)
),
sh_acc AS (
  SELECT doc_id, i, sum(CASE WHEN (hv // p.v) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM sh_hv CROSS JOIN pow2 p GROUP BY doc_id, i
),
sh_val AS (
  SELECT a.doc_id, sum(CASE WHEN a.s > 0 THEN p.v ELSE CAST(0 AS HUGEINT) END) AS v
  FROM sh_acc a JOIN pow2 p ON p.i = a.i GROUP BY a.doc_id
),
simhash_v AS (
  SELECT d.{id_col} AS doc_id, coalesce(s.v, CAST(0 AS HUGEINT)) AS v
  FROM {src} d LEFT JOIN sh_val s ON s.doc_id = d.{id_col}
)
"""


def trigram_counts_cte(
    src_select: str, prefix: str, dim: int = 64
) -> str:
    """CTE chain replicating ``functions.embedding.encode``'s integer
    trigram histogram for every (key, txt) row of ``src_select``:
    pad ``' ' || lower(strip(txt)) || ' '``, every char trigram
    (with multiplicity) hashed to a bucket via md5-little-endian-4 mod
    dim.  Exposes ``{prefix}_counts(key, bucket, cnt)``."""
    le4 = md5_le_int("h", 4)
    return f"""
{prefix}_pad AS (
  SELECT key, ' ' || lower(regexp_replace(txt, '^{_PY_WS_CLASS}|{_PY_WS_CLASS}$', '', 'g')) || ' ' AS t
  FROM ({src_select})
),
{prefix}_tri AS (
  SELECT key, unnest(CASE WHEN length(t) < 3 THEN [t]
                     ELSE list_transform(range(1, length(t) - 1), i -> substr(t, i, 3))
                     END) AS g
  FROM {prefix}_pad
),
{prefix}_counts AS (
  SELECT key, CAST({le4} % {dim} AS BIGINT) AS bucket, count(*) AS cnt
  FROM (SELECT key, md5(g) AS h FROM {prefix}_tri)
  GROUP BY 1, 2
)
"""


def rolling_fp_expr(text_col: str = "text") -> str:
    """SQL expression for ``hashing.rolling_fingerprint`` (Karp–Rabin
    over UTF-8 bytes, base 257, mod 2^61-1) formatted ``%016x``.
    ASCII-equivalence: ``unicode(char) == byte`` holds for the ASCII
    corpora this oracle runs on (the Python side hashes bytes)."""
    chars = f"regexp_extract_all({text_col}, '(?s).')"
    codes = f"list_transform({chars}, c -> CAST(unicode(c) AS HUGEINT))"
    folded = (
        f"list_reduce(list_prepend(CAST(0 AS HUGEINT), {codes}), "
        f"(h, c) -> (h * 257 + c) % 2305843009213693951)"
    )
    return f"printf('%016x', CAST({folded} AS BIGINT))"


def simhash_hex_expr(v_col: str = "v") -> str:
    """HUGEINT simhash value → 16-hex-digit string (two 32-bit halves;
    printf('%x') would overflow on values ≥ 2^63)."""
    return (
        f"printf('%08x%08x', CAST({v_col} // 4294967296 AS BIGINT), "
        f"CAST({v_col} % 4294967296 AS BIGINT))"
    )


# ---------------------------------------------------------------------------
# Full oracle statements
# ---------------------------------------------------------------------------

def text_fingerprints_sql() -> str:
    return f"""
WITH {simhash_cte()}
SELECT d.doc_id,
       sha256(d.text) AS sha256,
       {simhash_hex_expr("s.v")} AS simhash_hex,
       {rolling_fp_expr("d.text")} AS rolling_fp
FROM documents d JOIN simhash_v s ON s.doc_id = d.doc_id
"""


def text_langid_sql() -> str:
    profiles = {
        "en": "the of and to in a is that it for on with as are",
        "de": "der die das und zu den von ist mit sich des auf nicht",
        "fr": "le la les de des et un une est dans que pour sur",
        "es": "el la los las de y que en un una es del por con",
    }
    toks = TOKENS.format(col="lower(text)")
    hit_cols = []
    for lang, words in profiles.items():
        lst = "[" + ", ".join(f"'{w}'" for w in words.split()) + "]"
        hit_cols.append(
            f"len(list_filter(toks, t -> list_contains({lst}, t))) AS h_{lang}"
        )
    return f"""
WITH t0 AS (
  SELECT doc_id, lang, text,
         len(regexp_extract_all(text, '[一-鿿]')) AS cjk,
         {toks} AS toks
  FROM documents
),
t1 AS (
  SELECT doc_id, lang, text, cjk,
         CAST(cjk AS DOUBLE) / GREATEST(length(text), 1) AS cjk_ratio,
         len(toks) AS ntok,
         {", ".join(hit_cols)}
  FROM t0
),
t2 AS (
  SELECT *, GREATEST(h_en, h_de, h_fr, h_es) AS best_hits FROM t1
)
SELECT doc_id, lang,
  CASE
    WHEN length(text) = 0 THEN 'unknown'
    WHEN cjk_ratio > 0.1 THEN 'zh'
    WHEN ntok = 0 THEN 'unknown'
    WHEN best_hits = 0 THEN 'unknown'
    WHEN h_en = best_hits THEN 'en'
    WHEN h_de = best_hits THEN 'de'
    WHEN h_fr = best_hits THEN 'fr'
    ELSE 'es'
  END AS lang_pred,
  CASE
    WHEN length(text) = 0 THEN 0.0
    WHEN cjk_ratio > 0.1 THEN LEAST(1.0, cjk_ratio * 5)
    WHEN ntok = 0 THEN 0.0
    ELSE CAST(best_hits AS DOUBLE) / ntok
  END AS lang_conf
FROM t2
"""


def text_embed_sql(dim: int = 64) -> str:
    cte = trigram_counts_cte(
        "SELECT doc_id AS key, text AS txt FROM documents", "emb", dim
    )
    return f"""
WITH {cte},
ranked AS (
  SELECT key, bucket, cnt,
         row_number() OVER (PARTITION BY key ORDER BY cnt DESC, bucket) AS rn,
         count(*) OVER (PARTITION BY key) AS nnz
  FROM emb_counts
)
SELECT key AS doc_id,
       CAST({dim} AS INT) AS dim,
       nnz,
       CAST(bucket AS BIGINT) AS argmax_bucket,
       TRUE AS norm_ok
FROM ranked WHERE rn = 1
"""


def dedup_ngram_sql(n: int = 3, threshold: float = 0.3) -> str:
    le8 = md5_le_int("h", 8)
    toks = TOKENS.format(col="text")
    return f"""
WITH tk AS (
  SELECT doc_id, {toks} AS toks FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, hv FROM (
    SELECT doc_id, {le8} AS hv FROM (
      SELECT doc_id, md5(g) AS h FROM (
        SELECT doc_id, unnest(
          CASE WHEN len(toks) = 0 THEN []
               WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - {n - 2}),
                                   i -> array_to_string(toks[i:i+{n - 1}], ' '))
          END) AS g
        FROM tk)))
),
sizes AS (SELECT doc_id, count(*) AS ng FROM grams GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM grams a JOIN grams b ON a.hv = b.hv AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT p.id_a, p.id_b,
         CAST(p.inter AS DOUBLE) / (sa.ng + sb.ng - p.inter) AS jaccard
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.id_a
  JOIN sizes sb ON sb.doc_id = p.id_b
)
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {threshold}
"""


def contamination_sql(n: int = 3, threshold: float = 0.5, denom: int = 7) -> str:
    """Replica of ``dedup.cross_ngram_contamination`` with the eval set
    = the mix32 1/denom id-hash sample of ``documents`` (the standing
    stand-in eval corpus), identity pairs excluded: containment =
    inter / |grams(eval)| ≥ threshold."""
    le8 = md5_le_int("h", 8)
    toks = TOKENS.format(col="text")
    sample = mix32_subquery("doc_id", ["doc_id"], "documents")
    return f"""
WITH tk AS (
  SELECT doc_id, {toks} AS toks FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, hv FROM (
    SELECT doc_id, {le8} AS hv FROM (
      SELECT doc_id, md5(g) AS h FROM (
        SELECT doc_id, unnest(
          CASE WHEN len(toks) = 0 THEN []
               WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - {n - 2}),
                                   i -> array_to_string(toks[i:i+{n - 1}], ' '))
          END) AS g
        FROM tk)))
),
eval_ids AS (SELECT doc_id FROM {sample} WHERE h % {denom} = 0),
eval_grams AS (SELECT g.doc_id, g.hv FROM grams g JOIN eval_ids e USING (doc_id)),
sizes AS (SELECT doc_id, count(*) AS ng FROM eval_grams GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM grams a JOIN eval_grams b ON a.hv = b.hv AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
cont AS (
  SELECT p.id_a, p.id_b, CAST(p.inter AS DOUBLE) / se.ng AS containment
  FROM pairs p JOIN sizes se ON se.doc_id = p.id_b
)
SELECT id_a, id_b, containment FROM cont WHERE containment >= {threshold}
"""


def token_windows_sql(size: int = 128, stride: int = 64) -> str:
    """Replica of ``analysis.token_windows``: full windows every
    ``stride`` plus the aligned tail window; short docs get one
    window; windows rejoin with single spaces."""
    toks = TOKENS.format(col="coalesce(text, '')")
    return f"""
WITH tk AS (
  SELECT doc_id, {toks} AS t FROM documents
),
starts AS (
  SELECT doc_id, t,
         unnest(list_sort(list_distinct(list_append(
             CASE WHEN len(t) <= {size} THEN [0]
                  ELSE range(0, len(t) - {size} + 1, {stride}) END,
             greatest(len(t) - {size}, 0))))) AS start
  FROM tk WHERE len(t) > 0
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS BIGINT)
         AS win_id,
       CAST(start AS BIGINT) AS start,
       CAST(least(len(t) - start, {size}) AS BIGINT) AS n_tokens,
       array_to_string(t[start + 1:start + {size}], ' ') AS window_text
FROM starts
"""


def pack_windows_sql(
    size: int = 64, stride: int = 48, budget: int = 512, num_buckets: int = 4
) -> str:
    """Replica of ``analysis.pack_windows`` over ``token_windows``
    output: mix32 doc-id bucket, per-bucket (doc_id, win_id) order,
    pack = cumulative-tokens-before // budget."""
    win = token_windows_sql(size=size, stride=stride)
    mix = mix32_subquery(
        "doc_id", ["doc_id", "win_id", "n_tokens"], "win"
    )
    return f"""
WITH win AS ({win}),
bucketed AS (
  SELECT doc_id, win_id, n_tokens, CAST(h % {num_buckets} AS INTEGER) AS pack_bucket
  FROM {mix}
)
SELECT doc_id, win_id, n_tokens, pack_bucket,
       CAST(coalesce(sum(n_tokens) OVER (
              PARTITION BY pack_bucket ORDER BY doc_id, win_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {budget} AS BIGINT) AS pack_id
FROM bucketed
"""


def _components_ctes(n: int, threshold: float) -> str:
    """Shared recursive-reachability CTE chain over the exact n-gram
    pairs; exposes ``comp(node, component)``."""
    inner = dedup_ngram_sql(n=n, threshold=threshold)
    return f"""WITH RECURSIVE pairs AS ({inner}),
cc_edges AS (
  SELECT id_a AS node, id_b AS nbr FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
cc_nodes AS (SELECT DISTINCT node FROM cc_edges),
reach(node, r) AS (
  SELECT node, node FROM cc_nodes
  UNION
  SELECT e.node, reach.r FROM cc_edges e JOIN reach ON reach.node = e.nbr
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)"""


def dedup_components_sql(n: int = 3, threshold: float = 0.3) -> str:
    """Oracle for ``dedup.connected_components`` over the exact n-gram
    Jaccard pairs: minimum reachable id per node via a recursive
    reachability CTE (terminates through the UNION dedup)."""
    return f"""
{_components_ctes(n, threshold)}
SELECT node, component FROM comp
"""


def dedup_survivors_sql(n: int = 3, threshold: float = 0.3) -> str:
    """Oracle for the keep-one-per-cluster curation query: every doc
    except the non-minimum members of each near-dup component."""
    return f"""
{_components_ctes(n, threshold)}
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node != component)
"""


def dedup_simhash_sql(max_hamming: int = 8, bands: int = 4, max_bucket: int = 256) -> str:
    width = 64 // bands
    p16 = ", ".join(
        f"({b}, CAST({1 << (b * width)} AS HUGEINT))" for b in range(bands)
    )
    return f"""
WITH {simhash_cte()},
bshift(b, bv) AS (VALUES {p16}),
sval AS (
  SELECT doc_id, v,
         CAST(CASE WHEN v >= CAST(9223372036854775808 AS HUGEINT)
                   THEN v - CAST(18446744073709551616 AS HUGEINT)
                   ELSE v END AS BIGINT) AS sv
  FROM simhash_v
),
buckets AS (
  SELECT s.doc_id, p.b, CAST((s.v // p.bv) % {1 << width} AS BIGINT) AS key
  FROM sval s CROSS JOIN bshift p
),
ranked AS (
  SELECT doc_id, b, key,
         row_number() OVER (PARTITION BY b, key ORDER BY doc_id) AS rn
  FROM buckets
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM ranked a JOIN ranked c
    ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
  WHERE a.rn <= {max_bucket} AND c.rn <= {max_bucket}
)
SELECT c.id_a, c.id_b, CAST(bit_count(xor(sa.sv, sb.sv)) AS BIGINT) AS hamming
FROM cand c
JOIN sval sa ON sa.doc_id = c.id_a
JOIN sval sb ON sb.doc_id = c.id_b
WHERE bit_count(xor(sa.sv, sb.sv)) <= {max_hamming}
"""


def dedup_minhash_sql(
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.4,
    max_bucket: int = 256,
    shingle: str = "char",
) -> str:
    rows_per_band = num_perm // bands
    if shingle == "char":
        # windowed polynomial shingle hash + lowbias32 finalizer (matches
        # hashing.char_shingles bit-for-bit): fold code points with base
        # 257 mod 2^32, then two xor-shift-16 / *0x45d9f3b rounds and a
        # final xor-shift — every product <= 2^58 (exact BIGINT)
        poly = (
            "(list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(regexp_extract_all(g, '(?s).'), "
            "c -> CAST(unicode(c) AS BIGINT))), "
            "(h, c) -> h * 257 + c) % 4294967296)"
        )
        shingle_cte = f"""sh_g AS (
  SELECT doc_id, unnest(
    CASE WHEN length(text) = 0 THEN []
         WHEN length(text) < {shingle_k} THEN [text]
         ELSE list_transform(range(1, length(text) - {shingle_k - 2}),
                             i -> substr(text, i, {shingle_k}))
    END) AS g
  FROM documents
),
sh_p AS (SELECT doc_id, {poly} AS p FROM sh_g),
sh_m1 AS (SELECT doc_id, (xor(p, p // 65536) * 73244475) % 4294967296 AS m FROM sh_p),
sh_m2 AS (SELECT doc_id, (xor(m, m // 65536) * 73244475) % 4294967296 AS m FROM sh_m1),
shv AS (
  SELECT DISTINCT doc_id, CAST(xor(m, m // 65536) AS BIGINT) AS x FROM sh_m2
)"""
    elif shingle == "word":
        # k-WORD shingles, md5-le-4 gram hash (hashing.word_shingles):
        # same tokenizer as the ngram oracle, whole-text gram when the
        # doc has < k words, no shingles for empty/whitespace-only text
        le4 = md5_le_int("h", 4)
        toks = TOKENS.format(col="text")
        shingle_cte = f"""sh_tk AS (
  SELECT doc_id, {toks} AS toks FROM documents
),
sh_g AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) = 0 THEN []
         WHEN len(toks) < {shingle_k} THEN [array_to_string(toks, ' ')]
         ELSE list_transform(range(1, len(toks) - {shingle_k - 2}),
                             i -> array_to_string(toks[i:i+{shingle_k - 1}], ' '))
    END) AS g
  FROM sh_tk
),
shv AS (
  SELECT DISTINCT doc_id, {le4} AS x
  FROM (SELECT doc_id, md5(g) AS h FROM sh_g)
)"""
    else:
        raise ValueError(f"shingle must be 'char' or 'word', got {shingle!r}")
    return f"""
WITH {shingle_cte},
perms(j, a, b) AS (VALUES {_minhash_perm_values(num_perm)}),
lanes AS (
  SELECT doc_id, j,
         CAST(min((CAST(a AS HUGEINT) * x + b) % 2305843009213693951)
              % 4294967296 AS BIGINT) AS lane
  FROM shv CROSS JOIN perms GROUP BY doc_id, j
),
bandkeys AS (
  SELECT doc_id, bi,
         CAST(bi AS VARCHAR) || ':' ||
         array_to_string(list(printf('%x', lane) ORDER BY j), '-') AS band_key
  FROM (SELECT doc_id, j, j // {rows_per_band} AS bi, lane FROM lanes)
  GROUP BY doc_id, bi
),
ranked AS (
  SELECT doc_id, band_key,
         row_number() OVER (PARTITION BY band_key ORDER BY doc_id) AS rn
  FROM bandkeys
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ranked a JOIN ranked b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
  WHERE a.rn <= {max_bucket} AND b.rn <= {max_bucket}
),
est AS (
  SELECT c.id_a, c.id_b,
         CAST(sum(CASE WHEN la.lane = lb.lane THEN 1 ELSE 0 END) AS DOUBLE)
         / {num_perm} AS est_jaccard
  FROM cand c
  JOIN lanes la ON la.doc_id = c.id_a
  JOIN lanes lb ON lb.doc_id = c.id_b AND lb.j = la.j
  GROUP BY 1, 2
)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= {threshold}
"""


def property_matches_sql(
    kg_cte: str, prop_rows: list[tuple[int, str, str]], k: int = 10
) -> str:
    """Oracle for the S7 top-k property-candidate sink: re-encode the
    distinct predicate surfaces AND the dictionary's property alias
    rows with the SQL trigram encoder, rank candidates per surface by
    cosine (computed from the exact integer histograms; the ranking was
    empirically verified stable — adjacent-candidate gaps ≥ 7e-3 vs
    float32-vs-double noise ≤ 1e-7), segment-maxed per property with
    the first-position tie-break, top-``k``.

    ``prop_rows`` = (position, property_id, alias) for the property
    rows of the broadcast dictionary, in table order — the same rows
    ``ResolvedDict`` builds its embedding matrix from.

    ``kg_cte`` must end with a CTE chain exposing ``triples``.
    """
    esc = lambda s: s.replace("'", "''")
    vals = ", ".join(
        f"({pos}, '{esc(pid)}', '{esc(alias)}')" for pos, pid, alias in prop_rows
    )
    q_cte = trigram_counts_cte(
        "SELECT surface AS key, surface AS txt FROM preds", "qs"
    ).strip().lstrip()
    d_cte = trigram_counts_cte(
        "SELECT pos AS key, alias AS txt FROM dictp", "da"
    ).strip().lstrip()
    return f"""{kg_cte},
preds AS (SELECT DISTINCT predicate AS surface FROM triples),
dictp(pos, id, alias) AS (VALUES {vals}),
{q_cte},
{d_cte},
qn AS (SELECT key, sqrt(sum(CAST(cnt * cnt AS DOUBLE))) AS n FROM qs_counts GROUP BY key),
dn AS (SELECT key, sqrt(sum(CAST(cnt * cnt AS DOUBLE))) AS n FROM da_counts GROUP BY key),
dots AS (
  SELECT q.key AS surface, d.key AS pos, sum(q.cnt * d.cnt) AS dot
  FROM qs_counts q JOIN da_counts d ON d.bucket = q.bucket
  GROUP BY 1, 2
),
sims AS (
  SELECT p.surface, d.pos, d.id, d.alias,
         coalesce(dt.dot, 0) / (nq.n * nd.n) AS sim
  FROM preds p
  CROSS JOIN dictp d
  LEFT JOIN dots dt ON dt.surface = p.surface AND dt.pos = d.pos
  JOIN qn nq ON nq.key = p.surface
  JOIN dn nd ON nd.key = d.pos
),
seg AS (
  SELECT surface, id, alias, sim, pos,
         row_number() OVER (PARTITION BY surface, id ORDER BY sim DESC, pos) AS srn
  FROM sims
),
best AS (SELECT surface, id, alias, sim FROM seg WHERE srn = 1),
prop_first AS (SELECT id, min(pos) AS fpos FROM dictp GROUP BY id),
ranked AS (
  SELECT b.surface, b.id, b.alias,
         row_number() OVER (PARTITION BY b.surface ORDER BY b.sim DESC, pf.fpos) AS rnk
  FROM best b JOIN prop_first pf ON pf.id = b.id
)
SELECT surface AS predicate, CAST(rnk AS INT) AS match_rank,
       id AS property_id, alias AS matched_text
FROM ranked WHERE rnk <= {k}
"""


def dedup_embedding_sql(
    threshold: float = 0.35, planes: int = 6, max_bucket: int = 256, dim: int = 64
) -> str:
    lits = _hyperplane_literals(planes, dim)

    def word(s: int) -> str:
        terms = []
        for p in range(planes):
            weight = 1 << (planes - 1 - p)
            terms.append(
                f"CASE WHEN list_dot_product(embedding, {lits[s * planes + p]}) > 0 "
                f"THEN {weight} ELSE 0 END"
            )
        return "(" + " + ".join(terms) + ")"

    return f"""
WITH words AS (
  SELECT vec_id, {word(0)} AS w0, {word(1)} AS w1 FROM embeddings
),
buckets AS (
  SELECT vec_id, 0 AS s, w0 AS w FROM words
  UNION ALL
  SELECT vec_id, 1 AS s, w1 AS w FROM words
),
ranked AS (
  SELECT vec_id, s, w,
         row_number() OVER (PARTITION BY s, w ORDER BY vec_id) AS rn
  FROM buckets
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM ranked a JOIN ranked b
    ON a.s = b.s AND a.w = b.w AND a.vec_id < b.vec_id
  WHERE a.rn <= {max_bucket} AND b.rn <= {max_bucket}
)
SELECT c.id_a, c.id_b
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.id_a
JOIN embeddings eb ON eb.vec_id = c.id_b
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold}
"""


def token_topk_sql(k: int = 20) -> str:
    toks = TOKENS.format(col="text")
    return f"""
WITH t AS (
  SELECT unnest({toks}) AS token FROM documents
),
c AS (SELECT token, count(*) AS n FROM t GROUP BY token)
SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT {k}
"""


def repetition_sql(src: str = "documents") -> str:
    """Replica of ``analysis.repetition_profile`` + the integer keep
    rule: duplicate-line characters (every occurrence counted, non-empty
    ``\\n``-split lines), most-frequent word bigram coverage (ties →
    lexicographically smallest), all emitted as BIGINTs.  ``src`` is the
    (doc_id, text) relation — a CTE name when composing."""
    toks = TOKENS.format(col="coalesce(text, '')")
    return f"""
WITH lines AS (
  SELECT doc_id,
         unnest(list_filter(string_split(coalesce(text, ''), chr(10)),
                            l -> l <> '')) AS ln
  FROM {src}
),
line_stats AS (
  SELECT doc_id,
         CAST(coalesce(sum(CASE WHEN cnt >= 2 THEN chars * cnt END), 0) AS BIGINT)
           AS dup_line_chars,
         CAST(coalesce(sum(chars * cnt), 0) AS BIGINT) AS line_chars
  FROM (SELECT doc_id, ln, count(*) AS cnt, length(ln) AS chars
        FROM lines GROUP BY doc_id, ln)
  GROUP BY doc_id
),
toks AS (SELECT doc_id, {toks} AS t FROM {src}),
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS g
  FROM toks WHERE len(t) >= 2
),
top_bigram AS (
  SELECT doc_id, CAST(cnt * length(g) AS BIGINT) AS top_bigram_chars
  FROM (SELECT doc_id, g, count(*) AS cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY count(*) DESC, g ASC) AS rn
        FROM bigrams GROUP BY doc_id, g)
  WHERE rn = 1
)
SELECT d.doc_id,
  coalesce(ls.dup_line_chars, 0) AS dup_line_chars,
  coalesce(ls.line_chars, 0) AS line_chars,
  coalesce(tb.top_bigram_chars, 0) AS top_bigram_chars,
  CAST(CASE WHEN len(tk.t) > 1 THEN len(tk.t) - 1 ELSE 0 END AS BIGINT) AS n_bigrams,
  CAST(length(coalesce(d.text, '')) AS BIGINT) AS n_chars,
  (coalesce(ls.dup_line_chars, 0) * 10 <= coalesce(ls.line_chars, 0) * 3
   AND coalesce(tb.top_bigram_chars, 0) * 5 <= length(coalesce(d.text, ''))) AS keep
FROM {src} d
LEFT JOIN line_stats ls USING (doc_id)
LEFT JOIN top_bigram tb USING (doc_id)
JOIN toks tk USING (doc_id)
"""


def curate_sql(weights: dict[str, int] | None = None) -> str:
    """End-to-end curation replica: fingerprint-dedup winners (min id
    per md5(text)) → repetition keep rule → deterministic split label.
    Composes the per-stage oracles over a ``winners`` CTE."""
    rep = repetition_sql(src="winners")
    mix = mix32_subquery("doc_id", ["doc_id"], "winners")
    return f"""
WITH winners AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(coalesce(text, ''))
                              ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
),
rep AS (SELECT doc_id, keep FROM ({rep})),
spl AS (SELECT doc_id, {_split_case_expr(weights)} AS split FROM {mix})
SELECT w.doc_id, s.split
FROM winners w
JOIN rep r ON r.doc_id = w.doc_id
JOIN spl s ON s.doc_id = w.doc_id
WHERE r.keep
"""


def mix32_subquery(id_expr: str, carry_cols: list[str], src: str) -> str:
    """Layered subquery computing ``h = mix32(id_lo32 ^ id_hi32)`` of
    ``id_expr`` (lowbias32 rounds; every product < 2^58 → exact BIGINT)
    while carrying ``carry_cols`` through."""
    cols = ", ".join(carry_cols)
    return f"""(
  SELECT {cols}, xor(m2, m2 // 65536) AS h FROM (
    SELECT {cols}, (xor(m1, m1 // 65536) * 73244475) % 4294967296 AS m2 FROM (
      SELECT {cols}, (xor(p0, p0 // 65536) * 73244475) % 4294967296 AS m1 FROM (
        SELECT {cols},
               xor({id_expr} % 4294967296, {id_expr} // 4294967296) AS p0
        FROM {src}))))"""


def _split_case_expr(weights: dict[str, int] | None) -> str:
    """The CASE expression mapping ``h % total`` to split labels —
    SHARED by ``split_sql`` and ``curate_sql`` so the two oracles can
    never disagree on the encoding."""
    weights = weights or {"train": 8, "val": 1, "test": 1}
    labels: list[str] = []
    for name, w in weights.items():
        labels.extend([name] * int(w))
    total = len(labels)
    cases = " ".join(
        f"WHEN h % {total} = {i} THEN '{lab}'" for i, lab in enumerate(labels)
    )
    return f"CASE {cases} END"


def split_sql(weights: dict[str, int] | None = None) -> str:
    """Replica of ``analysis.split_by_hash``: mix32(id) % total indexes
    the label list built from the weights in insertion order."""
    inner = mix32_subquery("doc_id", ["doc_id", "lang"], "documents")
    return (
        f"SELECT doc_id, lang, {_split_case_expr(weights)} AS split FROM {inner}"
    )


def sample_hash_sql(denom: int = 7) -> str:
    """mix32((id & 0xFFFFFFFF) ^ (id >> 32)) % denom == 0 — the exact
    integer fast path of ``analysis.sample_by_hash``."""
    inner = mix32_subquery("doc_id", ["doc_id", "lang"], "documents")
    return f"SELECT doc_id, lang FROM {inner} WHERE h % {denom} = 0"


def stratified_sample_sql(key: str = "lang", k: int = 3) -> str:
    """Oracle for ``analysis.stratified_sample_k``: per-group head-k in
    (mix32(id), id) order via ``row_number``."""
    inner = mix32_subquery("doc_id", ["doc_id", key], "documents")
    return f"""
SELECT doc_id, {key} FROM (
  SELECT doc_id, {key},
         row_number() OVER (PARTITION BY {key} ORDER BY h, doc_id) AS rn
  FROM {inner}
) WHERE rn <= {k}
"""


def _splitmix64_ctes(src: str, x_expr: str) -> str:
    """CTE chain computing splitmix64 of ``x_expr`` (a non-negative
    BIGINT) in HUGEINT arithmetic.  Wraparound 64-bit multiplies are
    decomposed into 32-bit limbs so no intermediate exceeds 2^97
    (HUGEINT holds 2^127-1; a naive 64x64 product would overflow).
    Exposes ``smx(doc_key, h)``."""
    M64 = 18446744073709551616
    M32 = 4294967296

    def mulmod(c: int, v: str) -> str:
        return (
            f"(CAST({c} AS HUGEINT) * ({v} % {M32}) + "
            f"((CAST({c} AS HUGEINT) * ({v} // {M32})) % {M32}) * {M32}) % {M64}"
        )

    return f"""
smx0 AS (
  SELECT doc_key,
         (CAST({x_expr} AS HUGEINT) + 11400714819323198485) % {M64} AS x
  FROM {src}
),
smx1 AS (SELECT doc_key, xor(x, x // 1073741824) AS x FROM smx0),
smx2 AS (SELECT doc_key, {mulmod(13787848793156543929, "x")} AS x FROM smx1),
smx3 AS (SELECT doc_key, xor(x, x // 134217728) AS x FROM smx2),
smx4 AS (SELECT doc_key, {mulmod(10723151780598845931, "x")} AS x FROM smx3),
smx AS (SELECT doc_key, xor(x, x // 2147483648) AS h FROM smx4)
"""


def hll_registers_sql(
    table: str = "orders", col: str = "o_custkey", p: int = 12
) -> str:
    """Oracle for ``relational.approx_distinct_registers``: the exact
    HLL register set from splitmix64 hashes — bucket = top p bits,
    rho = leading-zero count of the remaining 64-p bits + 1 (bit length
    via ``printf('%b')`` string length, exact for any integer)."""
    w_bits = 64 - p
    w_mod = 1 << w_bits
    return f"""
WITH vals AS (SELECT DISTINCT {col} AS doc_key FROM {table}),
{_splitmix64_ctes("vals", "doc_key").strip().lstrip()},
reg AS (
  SELECT CAST(h // {w_mod} AS BIGINT) AS bucket,
         CASE WHEN h % {w_mod} = 0 THEN {w_bits + 1}
              ELSE {w_bits + 1} - length(printf('%b', CAST(h % {w_mod} AS BIGINT)))
         END AS rho
  FROM smx
)
SELECT bucket, CAST(max(rho) AS BIGINT) AS register FROM reg GROUP BY bucket
"""


def ivf_recall_sql(
    n_queries: int = 5, n_cells: int = 16, nprobe: int = 4, k: int = 10
) -> str:
    """Full SQL replica of the ``centroids="first"`` IVF path
    (``similarity.knn_ivf``): centroids = the ``n_cells``
    smallest-id vectors; each vector joins its argmax-cosine cell
    (first-max tie-break = smallest cell index); each query probes its
    ``nprobe`` best cells (score desc, cell asc — the pipeline's
    stable argsort); top-k over the probed cells only.  Recall@k vs
    the brute-force top-k is reported as exact integers so the value
    hash is float-free.  Cosine is scale-invariant, so skipping the
    pipeline's explicit normalization changes no ordering."""
    return f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
  FROM embeddings ORDER BY vec_id LIMIT {n_cells}
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < {n_queries}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding, c.cv) DESC, c.cell
           ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cell
           ) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn <= {nprobe}
),
ivf AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, a.vec_id,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY list_cosine_similarity(q.qv, e.embedding) DESC, a.vec_id
           ) AS rn
    FROM probes p
    JOIN assign a ON a.cell = p.cell
    JOIN q ON q.query_id = p.query_id
    JOIN embeddings e ON e.vec_id = a.vec_id
  ) WHERE rn <= {k}
),
brute AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, e.embedding) DESC, e.vec_id
           ) AS rn
    FROM q CROSS JOIN embeddings e
  ) WHERE rn <= {k}
)
SELECT b.query_id,
       CAST(count(i.vec_id) AS BIGINT) AS hits,
       CAST(count(i.vec_id) * {k} AS BIGINT) AS recall_pct
FROM brute b
LEFT JOIN ivf i ON i.query_id = b.query_id AND i.vec_id = b.vec_id
GROUP BY b.query_id
"""
