"""DuckDB oracle SQL builders for the queries that round 1 shipped rows-only.

Every builder returns ANSI-ish SQL DuckDB can run over the driver's
pre-registered parquet views, mirroring the Spark query's arithmetic exactly
(IEEE fold order, int32 wrap-arounds, regex banks). Constants that both
engines must share (minhash params, LSH hyperplanes, the perplexity seed
corpus, lab regex banks) are imported from the SAME modules the Spark
operators use, so the two sides cannot drift.

Shared fragments (_SQL_NORM / _DOT / _NRM) live here; entry_queries imports
them (this module must not import entry_queries back).
"""

from __future__ import annotations

import os

# --- shared SQL fragments --------------------------------------------------

# normalizeForHashing (contentHasher.effect.ts:37-44) in DuckDB
SQL_NORM = (
    "trim(regexp_replace(regexp_replace(regexp_replace(lower(text),"
    " '\\s+', ' ', 'g'), '\\[.*?\\]', '', 'g'),"
    " '\\d{1,2}/\\d{1,2}/\\d{2,4}', 'DATE', 'g'))"
)

# dot/norms with explicit double casts + sequential list_reduce fold —
# bit-identical to Spark's aggregate() fold (list_cosine_similarity would
# accumulate in float32 and diverge at the 6th decimal)
DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)
NRM = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, x) -> acc + x))"
)


def _plane_literal(plane) -> str:
    """A hyperplane as a DuckDB DOUBLE list literal; repr() round-trips the
    exact IEEE double Spark gets from F.lit(float(x))."""
    return "[" + ", ".join(repr(float(x)) for x in plane) + "]"


# --- the deterministic clinical probe (structured extraction / narrative) ---
# The driver corpus is clinical-content-free lowercase prose (0 digits,
# 0 uppercase chars — verified), so extraction queries over raw text would be
# vacuously all-zero. Both engines append the SAME deterministic snippet
# derived from doc_id, exercising value parsing, status tiers
# (CRITICAL_LOW..CRITICAL_HIGH), BP diastolic capture, '<' values, unit
# capture, ICD-10 codes and imaging modalities on varied rows.

SQL_PROBE = """
CASE WHEN doc_id % 11 = 0 THEN text ELSE text
  || ' WBC: ' || CAST(doc_id % 25 AS VARCHAR) || '.' || CAST(doc_id % 10 AS VARCHAR) || ' x10E3/uL'
  || ' HGB: ' || CAST(5 + doc_id % 20 AS VARCHAR) || ' g/dL'
  || ' Glucose: ' || CAST(30 + (doc_id * 7) % 200 AS VARCHAR) || ' mg/dL'
  || ' BP: ' || CAST(80 + doc_id % 80 AS VARCHAR) || '/' || CAST(50 + doc_id % 50 AS VARCHAR)
  || ' HR: ' || CAST(40 + doc_id % 100 AS VARCHAR) || ' bpm'
  || ' Temp: 9' || CAST(7 + doc_id % 2 AS VARCHAR) || '.' || CAST(doc_id % 10 AS VARCHAR)
  || ' SpO2: ' || CAST(85 + doc_id % 15 AS VARCHAR) || '%'
  || CASE WHEN doc_id % 3 = 0
       THEN ' Dx: E11.' || CAST(doc_id % 10 AS VARCHAR) || ' and I10. CT chest and MRI brain reviewed. X-ray negative.'
       ELSE '' END
  || CASE WHEN doc_id % 7 = 0
       THEN ' Troponin: <0.0' || CAST(1 + doc_id % 9 AS VARCHAR) || ' ng/mL INR: '
            || CAST(doc_id % 4 AS VARCHAR) || '.' || CAST(doc_id % 10 AS VARCHAR)
            || ' Weight: ' || CAST(50 + doc_id % 60 AS VARCHAR) || '.5 kg'
       ELSE '' END
END
"""


def probe_expr():
    """The same probe as a native Spark Column (import-light: pyspark only
    inside the function)."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")

    def s(col):
        return col.cast("string")

    snippet = F.concat(
        F.lit(" WBC: "), s(d % 25), F.lit("."), s(d % 10), F.lit(" x10E3/uL"),
        F.lit(" HGB: "), s(d % 20 + 5), F.lit(" g/dL"),
        F.lit(" Glucose: "), s((d * 7) % 200 + 30), F.lit(" mg/dL"),
        F.lit(" BP: "), s(d % 80 + 80), F.lit("/"), s(d % 50 + 50),
        F.lit(" HR: "), s(d % 100 + 40), F.lit(" bpm"),
        F.lit(" Temp: 9"), s(d % 2 + 7), F.lit("."), s(d % 10),
        F.lit(" SpO2: "), s(d % 15 + 85), F.lit("%"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" Dx: E11."), s(d % 10),
                F.lit(" and I10. CT chest and MRI brain reviewed. X-ray negative."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit(" Troponin: <0.0"), s(d % 9 + 1),
                F.lit(" ng/mL INR: "), s(d % 4), F.lit("."), s(d % 10),
                F.lit(" Weight: "), s(d % 60 + 50), F.lit(".5 kg"),
            ),
        ).otherwise(F.lit("")),
    )
    return F.when(d % 11 == 0, F.col("text")).otherwise(F.concat(F.col("text"), snippet))


# --- markdown sink ----------------------------------------------------------

def sql_markdown() -> str:
    """Mirror of core.markdown.format_to_markdown with the q_markdown_sink
    constants (pii_count=0, fixed date). The driver docs are single-line, so
    clean_final_output reduces to whitespace trim (rstrip each line + final
    strip); multi-line layouts are covered by tests/test_markdown_core.py."""
    nl = "chr(10)"
    return f"""
SELECT doc_id,
  '---' || {nl}
  || 'source_file: "doc-' || CAST(doc_id AS VARCHAR) || '.txt"' || {nl}
  || 'file_size_bytes: ' || CAST(length(text) AS VARCHAR) || {nl}
  || 'file_type: "text/plain"' || {nl}
  || 'processed_date: "2026-01-01T00:00:00.000Z"' || {nl}
  || 'pii_scrubbed_count: 0' || {nl}
  || 'pii_confidence_score: 100' || {nl}
  || 'processing_engine: "Scrubah.PII-Local-v2-HIPAA"' || {nl}
  || 'processing_seconds: "0.00"' || {nl}
  || 'hipaa_compliant: true' || {nl}
  || '---' || {nl} || {nl}
  || '# Document Extraction' || {nl} || {nl}
  || regexp_replace(text, '^\\s+|\\s+$', '', 'g') || {nl} || {nl}
  || '---' || {nl}
  || '*CONFIDENTIALITY NOTICE: This document has been automatically scrubbed of PII. Original entities replaced: 0.*'
  AS markdown
FROM documents
"""


# --- structured extraction counts + narrative -------------------------------

def _lab_sql_parts():
    """Per-lab-test SQL fragments from the SAME regex bank the Python kernel
    uses (core.extraction.LAB_PATTERNS / REFERENCE_RANGES)."""
    from .core.extraction import LAB_PATTERNS, REFERENCE_RANGES

    parts = []
    for test, pat in LAB_PATTERNS.items():
        p = "(?i)" + pat.pattern.replace("'", "''")
        matched = f"regexp_matches(probe, '{p}')"
        raw = f"ltrim(regexp_extract(probe, '{p}', 1), '<')"
        value = f"CAST({raw} AS DOUBLE)"
        rng = REFERENCE_RANGES.get(test)
        if rng:
            low, high, def_unit = rng
            status = (
                f"CASE WHEN {value} < {repr(float(low) * 0.5)} THEN 'CRITICAL_LOW'"
                f" WHEN {value} > {repr(float(high) * 2)} THEN 'CRITICAL_HIGH'"
                f" WHEN {value} < {repr(float(low))} THEN 'LOW'"
                f" WHEN {value} > {repr(float(high))} THEN 'HIGH'"
                f" ELSE 'NORMAL' END"
            )
        else:
            def_unit = ""
            status = "'UNKNOWN'"
        if pat.groups >= 2:
            unit = f"coalesce(nullif(regexp_extract(probe, '{p}', 2), ''), '{def_unit}')"
        else:
            unit = f"'{def_unit}'"
        parts.append({
            "test": test, "matched": matched, "value": value,
            "status": status, "unit": unit,
        })
    return parts


def _vital_sql_parts():
    from .core.extraction import VITAL_PATTERNS

    parts = {}
    for vital, pat in VITAL_PATTERNS.items():
        p = "(?i)" + pat.pattern.replace("'", "''")
        parts[vital] = {
            "matched": f"regexp_matches(probe, '{p}')",
            "value": f"CAST(regexp_extract(probe, '{p}', 1) AS DOUBLE)",
            "value2": f"CAST(regexp_extract(probe, '{p}', 2) AS DOUBLE)",  # BP diastolic
        }
    return parts


_ICD10_SQL = r"'\b([A-Z]\d{2}(?:\.\d{1,4})?)\b'"
_MODALITY_SQL = r"'(?i)\b(X-?ray|CT|MRI|Ultrasound|US|PET|Mammogram|Fluoro)'"
# parse_modality rule order (core.extraction.parse_modality)
_MODALITY_CASE = (
    "CASE WHEN regexp_matches(m, '(?i)\\bx-?ray\\b') THEN 'XRAY'"
    " WHEN regexp_matches(m, '(?i)\\bct\\b') THEN 'CT'"
    " WHEN regexp_matches(m, '(?i)\\bmri\\b') THEN 'MRI'"
    " WHEN regexp_matches(m, '(?i)\\b(ultrasound|us)\\b') THEN 'ULTRASOUND'"
    " WHEN regexp_matches(m, '(?i)\\bpet\\b') THEN 'PET'"
    " WHEN regexp_matches(m, '(?i)\\bmammogram') THEN 'MAMMOGRAM'"
    " WHEN regexp_matches(m, '(?i)\\bfluoro') THEN 'FLUOROSCOPY'"
    " ELSE 'UNKNOWN' END"
)


def sql_structured_extraction() -> str:
    labs = _lab_sql_parts()
    vitals = _vital_sql_parts()
    n_labs = " + ".join(f"CASE WHEN {l['matched']} THEN 1 ELSE 0 END" for l in labs)
    vital_counts = []
    for name, v in vitals.items():
        w = 2 if name == "BP" else 1  # BP contributes systolic + diastolic
        vital_counts.append(f"CASE WHEN {v['matched']} THEN {w} ELSE 0 END")
    n_vitals = " + ".join(vital_counts)
    wbc = labs[0]
    assert wbc["test"] == "WBC"
    return f"""
WITH p AS (SELECT doc_id, {SQL_PROBE} AS probe FROM documents)
SELECT doc_id,
  CAST({n_labs} AS BIGINT) AS n_labs,
  CAST({n_vitals} AS BIGINT) AS n_vitals,
  CAST(len(list_distinct(regexp_extract_all(probe, {_ICD10_SQL}, 1))) AS BIGINT) AS n_icd10,
  CAST(len(list_distinct(list_transform(regexp_extract_all(probe, {_MODALITY_SQL}), m -> {_MODALITY_CASE}))) AS BIGINT) AS n_modalities,
  CASE WHEN {wbc['matched']} THEN round({wbc['value']}, 6) END AS wbc_value,
  CASE WHEN {wbc['matched']} THEN {wbc['status']} END AS wbc_status
FROM p
"""


def sql_narrative() -> str:
    """core.narrative.narrative_for_extraction (STANDARD verbosity) composed
    from the extraction banks — value strings use DuckDB's shortest-roundtrip
    double formatting, which matches Python str(float)."""
    labs = _lab_sql_parts()
    nl = "chr(10)"

    lab_lines = []
    normal_terms = []
    for l in labs:
        vstr = f"CAST({l['value']} AS VARCHAR)"
        flag = (
            f"CASE WHEN contains({l['status']}, 'CRITICAL') THEN ' ⚠️'"
            f" WHEN contains({l['status']}, 'HIGH') THEN ' (H)'"
            f" WHEN contains({l['status']}, 'LOW') THEN ' (L)'"
            f" ELSE '' END"
        )
        abnormal = f"({l['matched']} AND {l['status']} NOT IN ('NORMAL', 'UNKNOWN'))"
        lab_lines.append(
            f"CASE WHEN {abnormal} THEN "
            f"'• {l['test']}: ' || {vstr} || ' ' || {l['unit']} || {flag} END"
        )
        normal_terms.append(
            f"CASE WHEN {l['matched']} AND {l['status']} IN ('NORMAL', 'UNKNOWN') THEN 1 ELSE 0 END"
        )
    lab_lines_sql = ",\n    ".join(lab_lines)
    n_normal = " + ".join(normal_terms)

    vitals = _vital_sql_parts()
    bp, hr, rr, temp, spo2 = (vitals[k] for k in ("BP", "HR", "RR", "TEMP", "SPO2"))
    vital_parts = ",\n    ".join([
        f"CASE WHEN {bp['matched']} THEN 'BP ' || CAST({bp['value']} AS VARCHAR) || '/' || CAST({bp['value2']} AS VARCHAR) END",
        f"CASE WHEN {hr['matched']} THEN 'HR ' || CAST({hr['value']} AS VARCHAR) END",
        f"CASE WHEN {rr['matched']} THEN 'RR ' || CAST({rr['value']} AS VARCHAR) END",
        f"CASE WHEN {temp['matched']} THEN 'T ' || CAST({temp['value']} AS VARCHAR) || '°F' END",
        f"CASE WHEN {spo2['matched']} THEN 'SpO2 ' || CAST({spo2['value']} AS VARCHAR) || '%' END",
    ])

    return f"""
WITH p AS (SELECT doc_id, {SQL_PROBE} AS probe FROM documents),
ex AS (
  SELECT doc_id,
    list_sort(list_distinct(regexp_extract_all(probe, {_ICD10_SQL}, 1))) AS codes,
    list_filter([
    {lab_lines_sql}
    ], x -> x IS NOT NULL) AS abnormal_lines,
    ({n_normal}) AS n_normal,
    list_filter([
    {vital_parts}
    ], x -> x IS NOT NULL) AS vparts
  FROM p
), sec AS (
  SELECT doc_id,
    CASE WHEN len(codes) > 0 THEN
      'Primary: ' || codes[1] || ' (' || codes[1] || ')'
      || CASE WHEN len(codes) > 1
           THEN {nl} || array_to_string(list_transform(codes[2:], c -> '• ' || c || ' (' || c || ')'), {nl})
           ELSE '' END
    END AS dx,
    CASE WHEN len(abnormal_lines) > 0 OR n_normal > 0 THEN
      array_to_string(
        list_concat(abnormal_lines,
          CASE WHEN n_normal > 0
               THEN [CAST(n_normal AS VARCHAR) || ' other labs within normal limits']
               ELSE [] END),
        {nl})
    END AS lb,
    CASE WHEN len(vparts) > 0 THEN array_to_string(vparts, ', ') END AS vt
  FROM ex
)
SELECT doc_id,
  coalesce(array_to_string(list_filter([
    CASE WHEN dx IS NOT NULL THEN 'DIAGNOSES:' || {nl} || dx END,
    CASE WHEN lb IS NOT NULL THEN 'LABS:' || {nl} || lb END,
    CASE WHEN vt IS NOT NULL THEN 'VITALS:' || {nl} || vt END
  ], x -> x IS NOT NULL), {nl} || {nl}), '') AS narrative
FROM sec
"""


# --- simhash (JS int32 rolling hash, 64-bit vote vector) --------------------

def sql_simhash() -> str:
    """Bit-exact mirror of core.hashing.simhash_int: per word of the
    normalized text (len > 2), JS hash = int32(h*31 + charCode); 64 votes
    where bit i uses (h >> (i % 32)) & 1 — so votes[i] == votes[i+32] and the
    64-bit value is the 32-bit pattern repeated: v = u*2^32 + u (signed)."""
    # int32 wrap after each step; |h*31 + c| < 2^36 so int64 is safe
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(1, length(w)+1), i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))), "
        "(h, c) -> ((h*31 + c + 2147483648) % 4294967296 + 4294967296) % 4294967296 - 2147483648)"
    )
    votes = ",\n    ".join(
        f"sum(CASE WHEN (u // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(32)
    )
    packed = " + ".join(
        f"CASE WHEN v{i} > 0 THEN {1 << (31 - i)} ELSE 0 END" for i in range(32)
    )
    return f"""
WITH norm AS (SELECT doc_id, {SQL_NORM} AS nt FROM documents),
words AS (
  SELECT doc_id, unnest(list_filter(string_split(nt, ' '), w -> length(w) > 2)) AS w
  FROM norm
), hashes AS (
  SELECT doc_id, {fold} AS h FROM words
), ub AS (
  SELECT doc_id, CASE WHEN h < 0 THEN h + 4294967296 ELSE h END AS u FROM hashes
), votes AS (
  SELECT doc_id,
    {votes}
  FROM ub GROUP BY doc_id
), packed AS (
  SELECT doc_id, ({packed}) AS u32 FROM votes
)
SELECT d.doc_id,
  CAST(CASE WHEN p.u32 IS NULL THEN 0
            WHEN p.u32 >= 2147483648 THEN (p.u32 - 4294967296) * 4294967296 + p.u32
            ELSE p.u32 * 4294967296 + p.u32 END AS BIGINT) AS simhash
FROM documents d LEFT JOIN packed p USING (doc_id)
"""


# --- hyperplane-LSH ANN top-k ------------------------------------------------

def sql_lsh_ann_topk(dim: int = 64, n_planes: int = 8, k: int = 10, seed: int = 42) -> str:
    """operators.similarity.lsh_bucketed_topk with the SAME seeded hyperplanes
    (embedded as double literals) and the same sequential dot-product fold."""
    from .operators.similarity import _planes

    planes = _planes(dim, n_planes, seed)
    bits = " || ".join(
        f"CASE WHEN {DOT.format(a='embedding', b=_plane_literal(p))} >= 0 THEN '1' ELSE '0' END"
        for p in planes
    )
    cos = (
        f"CASE WHEN {NRM.format(a='q.qe')} * {NRM.format(a='c.ce')} > 0 "
        f"THEN {DOT.format(a='q.qe', b='c.ce')} / ({NRM.format(a='q.qe')} * {NRM.format(a='c.ce')}) "
        f"ELSE CAST(0.0 AS DOUBLE) END"
    )
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, ({bits}) AS sig FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, sig FROM sigs WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS ce, sig FROM sigs
), scored AS (
  SELECT q.query_id, c.neighbor_id, round({cos}, 6) AS cosine
  FROM c JOIN q USING (sig)
  WHERE c.neighbor_id != q.query_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --- minhash LSH candidate pairs ---------------------------------------------

def sql_minhash_lsh_pairs(k: int = 32, bands: int = 8, seed: int = 42) -> str:
    """operators.dedup.minhash_dedup_pairs semantics, brute-forced (oracle
    scale): full k-signature per doc via the md5-shingle path, pairs that
    collide in >= 1 of `bands` bands, est_jaccard = matching positions / k."""
    from .operators.dedup import _P32, _minhash_params

    params = _minhash_params(k, seed)
    sig_items = ", ".join(
        f"coalesce(list_min(list_transform(sh, x -> (x % {_P32} * {a} + {b}) % {_P32})), {_P32})"
        for a, b in params
    )
    rows = k // bands
    band_match = " OR ".join(
        f"a.sig[{b * rows + 1}:{(b + 1) * rows}] = b.sig[{b * rows + 1}:{(b + 1) * rows}]"
        for b in range(bands)
    )
    return f"""
WITH words AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
), shingles AS (
  SELECT doc_id,
    CASE WHEN len(ws) >= 3 THEN
      list_distinct(list_transform(range(1, len(ws) - 1),
        i -> array_to_string(ws[i:i+2], ' ')))
    WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
    ELSE [] END AS sh_str
  FROM words
), hashed AS (
  SELECT doc_id,
    list_transform(sh_str, s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)) AS sh
  FROM shingles
), sigs AS (
  SELECT doc_id, [{sig_items}] AS sig FROM hashed
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(CAST(len(list_filter(range(1, {k + 1}), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / {float(k)}, 6) AS est_jaccard
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE {band_match}
"""


# --- trigram perplexity -------------------------------------------------------

def sql_perplexity() -> str:
    """core.perplexity.log_perplexity mirrored: the seed corpus is embedded
    verbatim; bigram counts come from trigram-prefix positions (seq[:-2]) to
    match _build_model; add-one smoothing over V=29; docs shorter than 3
    chars score 10.0. Docs are ASCII (verified), so the Python byte-level
    mapping equals this char-level mapping."""
    from .core.perplexity import _SEED, _VOCAB

    v = len(_VOCAB)
    seed_lit = _SEED.replace("'", "''")
    # char -> vocab index: a-z = ascii-97, ' '=26, '.'=27, ','=28, else 26
    cmap = (
        "CASE WHEN ascii({c}) BETWEEN 97 AND 122 THEN ascii({c}) - 97 "
        "WHEN {c} = '.' THEN 27 WHEN {c} = ',' THEN 28 ELSE 26 END"
    )
    return f"""
WITH seed AS (SELECT '{seed_lit}' AS s),
schars AS (
  SELECT i, {cmap.format(c="substr(s, CAST(i AS INT), 1)")} AS c
  FROM seed, unnest(range(1, length(s)+1)) AS t(i)
), s3 AS (
  SELECT c AS c1,
    lead(c, 1) OVER (ORDER BY i) AS c2,
    lead(c, 2) OVER (ORDER BY i) AS c3
  FROM schars
), tri AS (
  SELECT c1 * {v * v} + c2 * {v} + c3 AS tid, count(*) AS tc
  FROM s3 WHERE c3 IS NOT NULL GROUP BY 1
), bi AS (
  SELECT c1 * {v} + c2 AS bid, count(*) AS bc
  FROM s3 WHERE c3 IS NOT NULL GROUP BY 1
), dchars AS (
  SELECT doc_id, i, {cmap.format(c="substr(lower(text), CAST(i AS INT), 1)")} AS c
  FROM documents, unnest(range(1, length(text)+1)) AS t(i)
), d3 AS (
  SELECT doc_id, c AS c1,
    lead(c, 1) OVER (PARTITION BY doc_id ORDER BY i) AS c2,
    lead(c, 2) OVER (PARTITION BY doc_id ORDER BY i) AS c3
  FROM dchars
), scored AS (
  SELECT d.doc_id,
    avg(-ln((coalesce(t.tc, 0) + CAST(1.0 AS DOUBLE)) / (coalesce(b.bc, 0) + CAST({float(v)} AS DOUBLE)))) AS lp
  FROM d3 d
  LEFT JOIN tri t ON t.tid = d.c1 * {v * v} + d.c2 * {v} + d.c3
  LEFT JOIN bi b ON b.bid = d.c1 * {v} + d.c2
  WHERE d.c3 IS NOT NULL
  GROUP BY d.doc_id
)
SELECT doc.doc_id,
  round(CASE WHEN length(doc.text) < 3 THEN CAST(10.0 AS DOUBLE) ELSE s.lp END, 6) AS log_ppl
FROM documents doc LEFT JOIN scored s USING (doc_id)
"""


# --- semantic clusters (LSH cosine pairs -> connected components) -------------

def sql_semantic_clusters(dim: int = 64, n_planes: int = 6, threshold: float = 0.3,
                          seed: int = 42, limit: int = 20) -> str:
    """operators.similarity.cosine_pairs(exact=False) + connected components
    (min node id per component) via a recursive reachability CTE, then top-k
    cluster sizes. Same hyperplanes, same dot fold, same tie-break order."""
    from .operators.similarity import _planes

    planes = _planes(dim, n_planes, seed)
    bits = " || ".join(
        f"CASE WHEN {DOT.format(a='embedding', b=_plane_literal(p))} >= 0 THEN '1' ELSE '0' END"
        for p in planes
    )
    cos = (
        f"CASE WHEN {NRM.format(a='a.embedding')} * {NRM.format(a='b.embedding')} > 0 "
        f"THEN {DOT.format(a='a.embedding', b='b.embedding')} / ({NRM.format(a='a.embedding')} * {NRM.format(a='b.embedding')}) "
        f"ELSE CAST(0.0 AS DOUBLE) END"
    )
    return f"""
WITH RECURSIVE sigs AS (
  SELECT vec_id, embedding, ({bits}) AS sig FROM embeddings
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
  WHERE {cos} >= {threshold}
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), walk(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.r
), labels AS (
  SELECT node, min(r) AS cluster_id FROM walk GROUP BY node
), sizes AS (
  SELECT cluster_id, count(*) AS size FROM labels GROUP BY cluster_id
)
SELECT cluster_id, CAST(size AS BIGINT) AS size
FROM sizes ORDER BY size DESC, cluster_id ASC LIMIT {limit}
"""


# --- n-gram template strip over the framed multiline view ----------------------
# The driver corpus is single-line prose; real web pages carry boilerplate
# chrome around content. Both engines derive the same multiline view: content
# re-wrapped into 5-word lines, framed by this fixed 3-line header + 3-line
# footer. The Spark side then DETECTS the chrome with the n-gram corpus
# (threshold max(3, 30% of docs)), strips it, and must recover exactly the
# content — which the oracle computes directly.

CHROME_HEADER = (
    "== clinical record header ==\n"
    "facility: general hospital system\n"
    "confidential do not distribute"
)
CHROME_FOOTER = (
    "page 1 of 1\n"
    "generated by records system\n"
    "== end of record =="
)


def sql_template_ngram_strip() -> str:
    h = CHROME_HEADER.replace("\n", "' || chr(10) || '")
    f = CHROME_FOOTER.replace("\n", "' || chr(10) || '")
    return f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws FROM documents
), l AS (
  SELECT doc_id,
    array_to_string(
      list_transform(range(0, CAST(ceil(len(ws) / 5.0) AS BIGINT)),
        i -> array_to_string(ws[i*5+1 : i*5+5], ' ')),
      chr(10)) AS stripped_text
  FROM w
)
SELECT doc_id,
  stripped_text,
  CAST(length('{h}' || chr(10) || stripped_text || chr(10) || '{f}')
       - length(stripped_text) AS BIGINT) AS chars_removed,
  CAST(2 AS BIGINT) AS n_refs
FROM l
"""


SQL_COMPRESSION_SUMMARY_TEMPLATE = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws FROM documents
), l AS (
  SELECT doc_id,
    array_to_string(
      list_transform(range(0, CAST(ceil(len(ws) / 5.0) AS BIGINT)),
        i -> array_to_string(ws[i*5+1 : i*5+5], ' ')),
      chr(10)) AS stripped_text
  FROM w
), sized AS (
  SELECT doc_id,
    length('{h}' || chr(10) || stripped_text || chr(10) || '{f}') AS orig,
    length(stripped_text) AS comp
  FROM l
)
SELECT CAST(count(*) AS BIGINT) AS docs,
  CAST(sum(orig) AS BIGINT) AS original_chars,
  CAST(sum(comp) AS BIGINT) AS stripped_chars,
  round(CAST(sum(CAST(CAST(comp AS DOUBLE) / CAST(orig AS DOUBLE) AS DECIMAL(28,12))) / count(*) AS DOUBLE), 6) AS avg_compression_ratio
FROM sized
"""


def sql_compression_summary() -> str:
    h = CHROME_HEADER.replace("\n", "' || chr(10) || '")
    f = CHROME_FOOTER.replace("\n", "' || chr(10) || '")
    return SQL_COMPRESSION_SUMMARY_TEMPLATE.format(h=h, f=f)


def framed_text_expr():
    """The framed multiline view as a Spark Column (mirrors
    sql_template_ngram_strip's derivation)."""
    from pyspark.sql import functions as F

    rewrapped = F.expr(
        "array_join(transform(sequence(0, CAST(ceil(size(split(text, '\\\\s+')) / 5.0) AS INT) - 1),"
        " i -> array_join(slice(split(text, '\\\\s+'), i*5+1, 5), ' ')), '\\n')"
    )
    return F.concat(
        F.lit(CHROME_HEADER + "\n"), rewrapped, F.lit("\n" + CHROME_FOOTER)
    )


# --- embedding-cosine near-dup over documents -------------------------------------

def sql_doc_embed_neardup(dim: int = 64, n_planes: int = 6,
                          threshold: float = 0.75, seed: int = 42) -> str:
    """operators.embed_op hash-encoder path mirrored end-to-end in SQL:
    chunk(512/50) -> md5 feature-hash (+/-1 buckets) -> L2 normalize ->
    mean-pool over chunks -> L2 normalize -> FLOAT32 quantize (the Spark UDF
    returns array<float>) -> hyperplane-LSH pairs with the reference's
    duplicate/similar/related tiers. Every float fold is sequential to match
    the Python/Spark side."""
    from .operators.similarity import _planes

    planes = _planes(dim, n_planes, seed)
    raw_items = ", ".join(
        f"sum(CASE WHEN idx = {i} THEN sgn ELSE CAST(0.0 AS DOUBLE) END)"
        for i in range(dim)
    )
    sq_fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform({v}, x -> x * x)), (a, x) -> a + x)"
    )
    bits = " || ".join(
        f"CASE WHEN {DOT.format(a='embedding', b=_plane_literal(p))} >= 0 THEN '1' ELSE '0' END"
        for p in planes
    )
    cos = (
        f"CASE WHEN {NRM.format(a='a.embedding')} * {NRM.format(a='b.embedding')} > 0 "
        f"THEN {DOT.format(a='a.embedding', b='b.embedding')} / ({NRM.format(a='a.embedding')} * {NRM.format(a='b.embedding')}) "
        f"ELSE CAST(0.0 AS DOUBLE) END"
    )
    zero_vec = "[" + ", ".join(["CAST(0.0 AS FLOAT)"] * dim) + "]"
    return f"""
WITH chunks AS (
  SELECT doc_id, i AS chunk_no, substr(text, CAST(i * 462 + 1 AS INT), 512) AS chunk
  FROM documents, unnest(range(0, CAST(ceil(length(text) / 462.0) AS BIGINT))) AS t(i)
  WHERE length(substr(text, CAST(i * 462 + 1 AS INT), 512)) > 0
), words AS (
  SELECT doc_id, chunk_no,
    unnest(list_filter(regexp_split_to_array(lower(chunk), '\\s+'), w -> len(w) > 0)) AS w
  FROM chunks
), feats AS (
  SELECT doc_id, chunk_no,
    CAST(concat('0x', substr(md5(w), 1, 2)) AS INT) % {dim} AS idx,
    CASE WHEN CAST(concat('0x', substr(md5(w), 3, 2)) AS INT) % 2 = 0
         THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sgn
  FROM words
), raw AS (
  SELECT doc_id, chunk_no, [{raw_items}] AS rv
  FROM feats GROUP BY doc_id, chunk_no
), cvec AS (
  SELECT doc_id, chunk_no,
    CASE WHEN sqrt({sq_fold.format(v='rv')}) > 0
         THEN list_transform(rv, x -> x / sqrt({sq_fold.format(v='rv')}))
         ELSE rv END AS nv
  FROM raw
), docv AS (
  SELECT doc_id, count(*) AS nc, array_agg(nv ORDER BY chunk_no) AS vs
  FROM cvec GROUP BY doc_id
), pooled AS (
  SELECT doc_id,
    list_transform(range(1, {dim + 1}), i ->
      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(vs, v -> v[i])),
                  (a, x) -> a + x) / nc) AS pv
  FROM docv
), normed AS (
  SELECT doc_id,
    CASE WHEN sqrt({sq_fold.format(v='pv')}) > 0
         THEN list_transform(pv, x -> CAST(x / sqrt({sq_fold.format(v='pv')}) AS FLOAT))
         ELSE list_transform(pv, x -> CAST(x AS FLOAT)) END AS embedding
  FROM pooled
), emb AS (
  SELECT d.doc_id, coalesce(n.embedding, {zero_vec}) AS embedding
  FROM documents d LEFT JOIN normed n USING (doc_id)
), sigs AS (
  SELECT doc_id, embedding, ({bits}) AS sig FROM emb
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    round({cos}, 6) AS cosine,
    {cos} AS _c
  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, cosine,
  CASE WHEN _c >= 0.95 THEN 'duplicate'
       WHEN _c >= 0.85 THEN 'similar'
       ELSE 'related' END AS tier
FROM pairs WHERE _c >= {threshold}
"""


# --- scrub audit summary ---------------------------------------------------------
# The raw corpus contains no PII (no digits at all), so the audit query
# appends a deterministic PII probe per doc_id — one email + one phone
# always, plus SSN / ZIP / DATE on doc_id mod 2/3/5 — constructed so cascade
# stages do not interact (verified: each token is hit by exactly its own
# pattern). The oracle derives the expected summary arithmetic
# (auditCollector.ts:64-106) directly from the probe construction.

def pii_probe_expr():
    from pyspark.sql import functions as F

    d = F.col("doc_id")

    def s(col):
        return col.cast("string")

    return F.concat(
        F.col("text"),
        F.lit(" Contact: user"), s(d), F.lit("@example.com"),
        F.lit(" Phone: 555-"), s(d % 900 + 100), F.lit("-"), s(d % 9000 + 1000),
        F.when(d % 2 == 0, F.concat(
            F.lit(" SSN: "), s(d % 900 + 100), F.lit("-"), s(d % 90 + 10),
            F.lit("-"), s(d % 9000 + 1000),
        )).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.concat(
            F.lit(" zip "), s(d % 90000 + 10000),
        )).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(
            F.lit(" on "), s(d % 12 + 1), F.lit("/"), s(d % 28 + 1), F.lit("/2024"),
        )).otherwise(F.lit("")),
    )


def sql_scrub_audit() -> str:
    """Expected audit summary for the probe: placeholder lengths are
    [EMAIL_1]=9 [PHONE_1]=9 [SSN_1]=7 [ZIP_1]=7 [DATE_1]=8 (each pattern hits
    exactly one value, so every counter is 1). JS Math.round(x*k)/k ==
    floor(x*k + 0.5)/k."""
    return """
WITH p AS (
  SELECT doc_id, text,
    'user' || CAST(doc_id AS VARCHAR) || '@example.com' AS email_v,
    '555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) AS phone_v,
    CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 90 + 10 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) END AS ssn_v,
    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 90000 + 10000 AS VARCHAR) END AS zip_v,
    CASE WHEN doc_id % 5 = 0 THEN CAST(doc_id % 12 + 1 AS VARCHAR) || '/' || CAST(doc_id % 28 + 1 AS VARCHAR) || '/2024' END AS date_v
  FROM documents
), m AS (
  SELECT doc_id,
    length(text) + length(' Contact: ' || email_v || ' Phone: ' || phone_v)
      + coalesce(length(' SSN: ' || ssn_v), 0)
      + coalesce(length(' zip ' || zip_v), 0)
      + coalesce(length(' on ' || date_v), 0) AS orig,
    length(email_v) + length(phone_v)
      + coalesce(length(ssn_v), 0) + coalesce(length(zip_v), 0)
      + coalesce(length(date_v), 0) AS pii,
    2 + CASE WHEN ssn_v IS NOT NULL THEN 1 ELSE 0 END
      + CASE WHEN zip_v IS NOT NULL THEN 1 ELSE 0 END
      + CASE WHEN date_v IS NOT NULL THEN 1 ELSE 0 END AS total,
    9 + 9 + CASE WHEN ssn_v IS NOT NULL THEN 7 ELSE 0 END
      + CASE WHEN zip_v IS NOT NULL THEN 7 ELSE 0 END
      + CASE WHEN date_v IS NOT NULL THEN 8 ELSE 0 END AS ph_len,
    'EMAIL,PHONE'
      || CASE WHEN ssn_v IS NOT NULL THEN ',SSN' ELSE '' END
      || CASE WHEN zip_v IS NOT NULL THEN ',ZIPCODE' ELSE '' END
      || CASE WHEN date_v IS NOT NULL THEN ',DATE' ELSE '' END AS patterns_hit
  FROM p
)
SELECT doc_id,
  CAST(total AS INT) AS total_detections,
  CAST(pii AS INT) AS pii_chars_removed,
  floor(CAST(pii AS DOUBLE) / orig * 100 * 100 + 0.5) / 100 AS pii_density_percent,
  CAST((orig - pii + ph_len) - orig AS INT) AS size_change_bytes,
  floor(CAST(pii AS DOUBLE) / total * 10 + 0.5) / 10 AS avg_pii_length,
  patterns_hit
FROM m
"""


# --- lab trend summary --------------------------------------------------------------

def sql_lab_trend_summary() -> str:
    """operators.extraction_op.lab_trends over the clinical probe, with
    doc_id standing in for the timestamp order (the probe corpus is
    time-free): per test first/last (by doc_id) + min/max + the reference's
    trend classifier (structuredExtraction.effect.ts:562-631)."""
    selects = []
    for l in _lab_sql_parts():
        selects.append(
            f"SELECT doc_id, '{l['test']}' AS test, {l['value']} AS value "
            f"FROM p WHERE {l['matched']}"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH p AS (SELECT doc_id, {SQL_PROBE} AS probe FROM documents),
labs AS (
{union}
), agg AS (
  SELECT test,
    count(*) AS n,
    arg_min(value, doc_id) AS first_v,
    arg_max(value, doc_id) AS last_v,
    min(value) AS min_v,
    max(value) AS max_v
  FROM labs GROUP BY test
)
SELECT test, CAST(n AS BIGINT) AS n,
  round(first_v, 6) AS first_v, round(last_v, 6) AS last_v,
  round(min_v, 6) AS min_v, round(max_v, 6) AS max_v,
  CASE WHEN n < 2 THEN 'INSUFFICIENT_DATA'
       WHEN (max_v - min_v) > 1.5 * abs(last_v - first_v) THEN 'FLUCTUATING'
       WHEN (CASE WHEN first_v != 0 THEN abs(last_v - first_v) / abs(first_v) * 100 END) < 5.0 THEN 'STABLE'
       WHEN (last_v - first_v) > 0 THEN 'INCREASING'
       ELSE 'DECREASING' END AS trend
FROM agg
"""


# --- multimodal feature plumbing -----------------------------------------------------

SQL_MULTIMODAL = """
WITH h AS (
  SELECT doc_id, length(text) AS blen, sha256(text) AS hex
  FROM documents
)
SELECT doc_id, hex AS sha256, CAST(blen AS BIGINT) AS byte_len,
  round(CAST(CAST(CAST(concat('0x', substr(hex, 1, 2)) AS INT) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f0,
  round(CAST(CAST(CAST(concat('0x', substr(hex, 3, 2)) AS INT) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f1,
  round(CAST(CAST(CAST(concat('0x', substr(hex, 5, 2)) AS INT) / 255.0 AS FLOAT) AS DOUBLE), 6) AS f2
FROM h
"""


# --- Effect-set scrub over the PII probe ---------------------------------------------

SQL_PII_SCRUB = """
SELECT doc_id,
  text || ' Contact: [EMAIL_1] Phone: [PHONE_1]'
    || CASE WHEN doc_id % 2 = 0 THEN ' SSN: [SSN_1]' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN ' zip [ZIP_1]' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' on [DATE_1]' ELSE '' END AS scrubbed_text,
  CAST(2 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
         + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
         + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS INT) AS pii_count
FROM documents
"""


# --- YAML compression sink ---------------------------------------------------------

YAML_GENERATED_AT = "2026-01-01T00:00:00.000Z"


def sql_yaml_sink() -> str:
    """core.yaml_sink.generate_yaml layout (yaml.ts:318-358 section order)
    assembled per user from the events table: per-user timeline entries
    ordered by (ts, event_id), deterministic metadata derived from the event
    count, no medications/labTrends/warnings sections (omitted when empty)."""
    nl = "chr(10)"
    hdr = (
        "'# ' || repeat('=', 70) || chr(10) || "
        "'# COMPRESSED MEDICAL TIMELINE' || chr(10) || "
        "'# Generated by Scrubah.PII - Zero-trust medical data sanitizer' || chr(10) || "
        "'# All PII has been redacted and replaced with placeholders' || chr(10) || "
        "'# ' || repeat('=', 70)"
    )
    return f"""
WITH agg AS (
  SELECT user_id, count(*) AS n, min(ts) AS mn, max(ts) AS mx,
    string_agg(
      '  - id: ' || CAST(event_id AS VARCHAR) || {nl} ||
      '    date: ' || strftime(ts, '%Y-%m-%d') || {nl} ||
      '    type: ' || event_type || {nl} ||
      '    source: doc-' || CAST(event_id AS VARCHAR) || {nl} ||
      '    confidence: 1',
      {nl} ORDER BY ts, event_id) AS timeline_block
  FROM events GROUP BY user_id
)
SELECT user_id,
  {hdr} || {nl} || {nl}
  || 'metadata:' || {nl}
  || '  generatedAt: {YAML_GENERATED_AT}' || {nl}
  || '  version: "1.0.0"' || {nl}
  || '  schemaVersion: "1.0.0"' || {nl} || {nl}
  || '  compression:' || {nl}
  || '    originalSizeKb: ' || printf('%.2f', n * CAST(0.2 AS DOUBLE)) || {nl}
  || '    compressedSizeKb: ' || printf('%.2f', n * CAST(0.1 AS DOUBLE)) || {nl}
  || '    ratio: 50.0%' || {nl}
  || '    eventsTotal: ' || CAST(n AS VARCHAR) || {nl}
  || '    eventsIncluded: ' || CAST(n AS VARCHAR) || {nl}
  || '    eventsRemoved: 0' || {nl}
  || '    deduplication: exact' || {nl} || {nl}
  || 'patient:' || {nl}
  || '  id: ' || CAST(user_id AS VARCHAR) || {nl}
  || '  ageAtFirstVisit: ' || CAST(20 + user_id % 60 AS VARCHAR) || {nl} || {nl}
  || 'dateRange:' || {nl}
  || '  start: ' || strftime(mn, '%Y-%m-%d') || {nl}
  || '  end: ' || strftime(mx, '%Y-%m-%d') || {nl}
  || '  durationDays: ' || CAST(CAST(floor(date_diff('second', mn, mx) / CAST(86400 AS DOUBLE)) AS BIGINT) AS VARCHAR) || {nl} || {nl}
  || 'totalDocuments: ' || CAST(n AS VARCHAR) || {nl}
  || 'totalEvents: ' || CAST(n AS VARCHAR) || {nl} || {nl}
  || 'timeline:' || {nl}
  || timeline_block
  AS yaml
FROM agg
"""


# --- master timeline markdown report --------------------------------------------

def sql_timeline_report() -> str:
    """operators.report.timeline_markdown layout
    (timelineOrganizer.effect.ts:345-452) per user over events: summary
    header + chronologically numbered per-document sections. Timestamps
    formatted '%Y-%m-%d %H:%M:%S.%f' in both engines."""
    nl = "chr(10)"
    fmt = "'%Y-%m-%d %H:%M:%S.%f'"
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, ts, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
  FROM events
), agg AS (
  SELECT user_id, count(*) AS n,
    strftime(min(ts), {fmt}) AS mn, strftime(max(ts), {fmt}) AS mx,
    string_agg(
      '## Document ' || CAST(seq AS VARCHAR)
        || ': doc-' || CAST(event_id AS VARCHAR) || {nl} ||
      '*Type: ' || event_type || ' | Date: ' || strftime(ts, {fmt}) || '*' || {nl} ||
      'value: ' || CAST(value AS VARCHAR),
      {nl} || {nl} ORDER BY seq) AS blocks
  FROM e GROUP BY user_id
)
SELECT user_id,
  '# Master Timeline' || {nl} || {nl}
  || 'Total documents: ' || CAST(n AS VARCHAR) || {nl}
  || 'Duplicates: 0' || {nl}
  || 'Date range: ' || mn || ' .. ' || mx || {nl} || {nl}
  || blocks || {nl}
  AS report
FROM agg
"""


# --- template lines over the word-per-line view --------------------------------

SQL_TEMPLATE_LINES = """
WITH n AS (SELECT count(*) AS total FROM documents),
lines AS (
  SELECT DISTINCT doc_id, trim(w) AS line
  FROM documents, unnest(regexp_split_to_array(text, '\\s+')) AS t(w)
  WHERE length(trim(w)) >= 6
), c AS (
  SELECT line, count(*) AS doc_count FROM lines GROUP BY line
)
SELECT line, CAST(doc_count AS BIGINT) AS doc_count
FROM c, n
WHERE doc_count >= greatest(2, CAST(floor(n.total * 0.5) AS BIGINT))
"""


# --- whitelist medical extraction --------------------------------------------
# Probe-driven expected-output oracle (same technique as pii_scrub /
# structured_extraction): the Spark query runs the REAL whitelist extractor
# (core/whitelist.py — JS-parity-proven vs tools/whitelist_harness.mjs) over a
# deterministic doc_id-derived probe; the oracle encodes the expected outputs
# as arithmetic. Probe variants cycle doc types (lab / imaging / pathology /
# medication-list / progress-note) and sweep every lab status tier.
# Expected values validated against the extractor for doc_id 0..299 before
# the SQL was written (see NOTES_r3.md).


def whitelist_probe_expr():
    """The whitelist probe as a Spark Column over doc_id."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")

    def s(col):
        return col.cast("string")

    t = d % 5
    k = d % 240
    k_div = F.floor(k / F.lit(10)).cast("long")
    g = (d * 7) % 180 + 20
    lab = F.concat(
        F.lit("Laboratory results\nDate: 3/"), s(d % 28 + 1),
        F.lit("/2024\nWBC: "), s(k_div), F.lit("."), s(k % 10),
        F.lit(" K/uL\nGlucose: "), s(g), F.lit(" mg/dL\n"),
    )
    img = F.concat(
        F.lit("Radiology imaging review\n"),
        F.when(d % 2 == 0, F.lit("CT")).otherwise(F.lit("MRI")),
        F.lit(" of the "),
        F.element_at(F.array(F.lit("chest"), F.lit("abdomen"), F.lit("pelvis")), (d % 3 + 1).cast("int")),
        F.lit(" performed today\nIMPRESSION: stable postsurgical scarring"
              " at the left base with no new nodule\n"),
    )
    path = F.concat(
        F.lit("Surgical pathology report\nSpecimen: gastric biopsy tissue\n"
              "DIAGNOSIS:\npoorly differentiated adenocarcinoma\nGRADE: "),
        s(d % 4),
        F.lit("\nMARGINS: "),
        F.when(d % 2 == 0, F.lit("negative")).otherwise(F.lit("positive")),
        F.lit("\n"),
    )
    meds = F.concat(
        F.lit("Pharmacy prescription refill\nMetformin "), s((d % 9 + 1) * 50),
        F.lit(" mg oral twice daily\nLisinopril "), s((d % 4 + 1) * 10),
        F.lit(" mg PO daily\n"),
    )
    note = F.concat(
        F.lit("Progress note assessment\nBP: "), s(d % 60 + 100),
        F.lit("/"), s(d % 40 + 60),
        F.lit(" HR: "), s(d % 100 + 40),
        F.lit(" RR: "), s(d % 20 + 10),
        F.lit("\nPatient diagnosed with chronic kidney disease today\n"),
    )
    return (
        F.when(t == 0, lab)
        .when(t == 1, img)
        .when(t == 2, path)
        .when(t == 3, meds)
        .otherwise(note)
    )


def sql_whitelist_extraction() -> str:
    return """
WITH p AS (
  SELECT doc_id, doc_id % 5 AS t, doc_id AS u,
         doc_id % 240 AS k, (doc_id * 7) % 180 + 20 AS g
  FROM documents
)
SELECT
  doc_id,
  CASE t WHEN 0 THEN 'lab_report' WHEN 1 THEN 'imaging'
         WHEN 2 THEN 'pathology' WHEN 3 THEN 'medication_list'
         ELSE 'progress_note' END AS document_type,
  CASE WHEN t = 0 THEN '3/' || CAST(u % 28 + 1 AS VARCHAR) || '/2024' END AS document_date,
  CAST(CASE WHEN t IN (0, 3, 4) THEN 76 ELSE 73 END AS BIGINT) AS confidence,
  CAST(CASE WHEN t = 0 THEN 2 ELSE 0 END AS BIGINT) AS n_labs,
  CAST(CASE WHEN t = 3 THEN 2 ELSE 0 END AS BIGINT) AS n_meds,
  CAST(CASE WHEN t = 4 THEN 1 ELSE 0 END AS BIGINT) AS n_dx,
  CAST(CASE WHEN t = 1 THEN 1 ELSE 0 END AS BIGINT) AS n_imaging,
  CAST(CASE WHEN t = 4 THEN 1 ELSE 0 END AS BIGINT) AS n_vitals,
  CAST(CASE WHEN t = 2 THEN 1 ELSE 0 END AS BIGINT) AS n_path,
  CASE WHEN t = 0 THEN 'WBC' END AS lab1_name,
  CASE WHEN t = 0 THEN CAST(k // 10 AS VARCHAR) || '.' || CAST(k % 10 AS VARCHAR) END AS lab1_value,
  CASE WHEN t = 0 THEN 'K/uL' END AS lab1_unit,
  CASE WHEN t = 0 THEN '4-11' END AS lab1_ref,
  CASE WHEN t = 0 THEN
    CASE WHEN k < 20 THEN 'Critical' WHEN k < 40 THEN 'Low'
         WHEN k > 220 THEN 'Critical' WHEN k > 110 THEN 'High'
         ELSE 'Normal' END
  END AS lab1_status,
  CASE WHEN t = 0 THEN
    CASE WHEN g < 35 THEN 'Critical' WHEN g < 70 THEN 'Low'
         WHEN g > 100 THEN 'High' ELSE 'Normal' END
  END AS lab2_status,
  CASE WHEN t = 0 THEN '3/' || CAST(u % 28 + 1 AS VARCHAR) || '/2024' END AS panel_date,
  CASE WHEN t = 3 THEN 'Metformin' END AS med1_name,
  CASE WHEN t = 3 THEN CAST((u % 9 + 1) * 50 AS VARCHAR) END AS med1_dose,
  CASE WHEN t = 3 THEN 'oral' END AS med1_route,
  CASE WHEN t = 3 THEN 'twice' END AS med1_freq,
  CASE WHEN t = 4 THEN 'chronic kidney disease' END AS dx1_condition,
  CASE WHEN t = 4 THEN 'unspecified' END AS dx1_severity,
  CASE WHEN t = 1 THEN (CASE WHEN u % 2 = 0 THEN 'ct' ELSE 'mri' END) END AS img_modality,
  CASE WHEN t = 1 THEN
    (CASE u % 3 WHEN 0 THEN 'chest' WHEN 1 THEN 'abdomen' ELSE 'pelvis' END)
  END AS img_body_part,
  CASE WHEN t = 2 THEN 'gastric biopsy tissue' END AS path_specimen,
  CASE WHEN t = 2 THEN 'poorly differentiated adenocarcinoma' END AS path_diagnosis,
  CASE WHEN t = 2 THEN CAST(u % 4 AS VARCHAR) END AS path_grade,
  CASE WHEN t = 2 THEN (CASE WHEN u % 2 = 0 THEN 'negative' ELSE 'positive' END) END AS path_margins,
  CAST(CASE WHEN t = 4 THEN u % 60 + 100 END AS BIGINT) AS vit_bp_sys,
  CAST(CASE WHEN t = 4 THEN u % 40 + 60 END AS BIGINT) AS vit_bp_dia,
  CAST(CASE WHEN t = 4 THEN u % 100 + 40 END AS BIGINT) AS vit_hr,
  CAST(CASE WHEN t = 4 THEN u % 20 + 10 END AS BIGINT) AS vit_rr
FROM p
"""


def sql_whitelist_timeline() -> str:
    # structural invariants of the rendered timeline markdown:
    # one '\n### ' document section per doc (+2 from the summary's
    # 'Active Diagnoses' / 'Current Medications' headings), one lab table
    # per lab-report probe doc, stats-block totals per category.
    return """
WITH p AS (SELECT doc_id % 25 AS b, doc_id % 5 AS t FROM documents)
SELECT
  CAST(b AS VARCHAR) AS group_key,
  CAST(count(*) AS BIGINT) AS total_documents,
  CAST(count(*) AS BIGINT) AS unique_documents,
  CAST(0 AS BIGINT) AS duplicates,
  CAST((count(*) + 2) * 5 AS BIGINT) AS section_chars,
  CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lab_tables,
  CAST(sum(CASE WHEN t = 0 THEN 2 ELSE 0 END) AS BIGINT) AS stats_labs,
  CAST(sum(CASE WHEN t = 3 THEN 2 ELSE 0 END) AS BIGINT) AS stats_meds,
  CAST(sum(CASE WHEN t = 4 THEN 1 ELSE 0 END) AS BIGINT) AS stats_dx
FROM p GROUP BY b
"""


# --- worker scrub: RESTRICTED probe with a derivable expected output ---------
# The worker engine's forward-order counters advance on intermediate matches
# (e.g. INSURANCE_ID fires on plain prose like "group <token>"), so an
# expected-output oracle over arbitrary text is not constructible. This probe
# is RESTRICTED by construction: every worker pattern fires exactly once, on
# exactly the intended span, and nothing fires on intermediate text —
# verified empirically against BOTH engines (Python port and the native-JS
# harness) for doc_id 0..499 before the SQL was written (NOTES_r3.md).
# Full worker semantics stay gated by the 500-doc goldens + adversarial fuzz
# (tests/test_goldens.py).


def worker_probe_expr():
    """Restricted worker-scrub probe as a Spark Column over doc_id."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")

    def s(col):
        return col.cast("string")

    return F.concat(
        F.lit("contact user"), s(d), F.lit("@example.com or call 555-"),
        s(d % 900 + 100), F.lit("-"), s(d % 9000 + 1000),
        F.lit(" now ssn "), s(d % 900 + 100), F.lit("-"), s(d % 90 + 10),
        F.lit("-"), s((d * 3) % 9000 + 1000),
        F.lit(" noted card 4111-1111-1111-"), s(d % 9000 + 1000),
        F.lit(" on file zip "), s(d % 90000 + 10000),
        F.lit(" here visited "), s(d % 12 + 1), F.lit("/"), s(d % 28 + 1),
        F.lit("/2024 then left aged "), s(d % 80 + 18),
        F.lit(" maybe. chart DOE, JANE noted. seen Smith, John today. "
              "met Mary-Jane there. visit Boston, MA soon. "
              "joined Henry Ford Jr today. moved to TX later near KODIAK "
              "clinic. MRN: AB"), s((d * 7) % 9000 + 1000),
        F.lit("CD charted. Patient Name: Carla Diaz was here. p.o. box "),
        s(d % 90 + 10),
        F.lit(" listed he lives at 12 oak street."),
    )


SQL_PII_SCRUB_WORKER = """
SELECT doc_id,
  'contact [EMAIL_1] or call [PHONE_1] now ssn [SSN_1] noted card [CARD_2]'
  || ' on file zip [ZIP_3] here visited [DATE_1] then left [AGE_2] maybe.'
  || ' chart [PER_1] noted. seen [PER_2] today. met [PER_3] there.'
  || ' visit [LOC_3] soon. joined [PER_4] today.'
  || ' moved to [STATE_4] later near [PER_5] clinic. MRN: [MRN_4] charted.'
  || ' Patient Name: [PER_6] was here. [POBOX_2] listed he lives at [ADDR_1]'
  AS scrubbed_text,
  CAST(18 AS INT) AS pii_count
FROM documents
"""


# --- corpus-shaping operators (operators/sampling.py) -----------------------


def sql_host_cap(n: int = 10) -> str:
    """Single-window top-N per host — the naive plan the salted two-phase
    production path (host_cap_topn) must equal exactly."""
    return f"""
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT doc_id, source, n_chars,
    row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents)
WHERE rank <= {n}
"""


def sql_dup_span_strip(n: int = 3, min_df: int = 5) -> str:
    """Naive-definition form of dup_span_strip: materialize every word
    n-gram, keep grams in >= min_df distinct docs, drop every word any
    frequent gram covers. Positions are 0-based to mirror Spark."""
    span = ", ".join(f"i + {k}" for k in range(n))
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS i, array_to_string(w[i:i + {n - 1}], ' ') AS gram
  FROM ws, unnest(range(1, greatest(len(w) - {n - 2}, 1))) AS t(i)
),
freq AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(DISTINCT doc_id) >= {min_df}
),
cov AS (
  SELECT doc_id,
         flatten(list(DISTINCT [{span}])) AS covered
  FROM grams JOIN freq USING (gram) GROUP BY doc_id
),
kept AS (
  SELECT ws.doc_id, w,
    list_filter(range(0, len(w)),
                p -> NOT list_contains(coalesce(covered, CAST([] AS BIGINT[])), p))
      AS keep_pos
  FROM ws LEFT JOIN cov ON ws.doc_id = cov.doc_id
)
SELECT doc_id,
  array_to_string(list_transform(keep_pos, p -> w[CAST(p + 1 AS INT)]), ' ')
    AS cleaned_text,
  CAST(len(keep_pos) AS BIGINT) AS n_words_kept,
  CAST(len(w) - len(keep_pos) AS BIGINT) AS n_words_dropped
FROM kept
"""


def sql_chunk_dedup(chunk_words: int = 5) -> str:
    """Naive window-definition form of chunk_dedup: row_number over the
    chunk keeps the globally-first occurrence — the exact plan shape the
    production path avoids (hot-chunk funnel), re-proving the
    min(struct)-aggregate rewrite."""
    cw = chunk_words
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ch AS (
  SELECT doc_id, i AS pos,
         array_to_string(w[(i * {cw} + 1):(i * {cw} + {cw})], ' ') AS chunk
  FROM ws, unnest(range(0, CAST(ceil(len(w) / {cw}.0) AS BIGINT))) t(i)
),
kept AS (
  SELECT doc_id, pos, chunk FROM (
    SELECT doc_id, pos, chunk,
           row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
    FROM ch)
  WHERE rn = 1
),
reb AS (
  SELECT doc_id,
         array_to_string(list(chunk ORDER BY pos), ' ') AS cleaned_text,
         count(*) AS k
  FROM kept GROUP BY doc_id
),
tot AS (
  SELECT doc_id,
         CAST(ceil(len(string_split(text, ' ')) / {cw}.0) AS BIGINT) AS n
  FROM documents
)
SELECT tot.doc_id,
  coalesce(cleaned_text, '') AS cleaned_text,
  CAST(coalesce(k, 0) AS BIGINT) AS n_chunks_kept,
  CAST(n - coalesce(k, 0) AS BIGINT) AS n_chunks_dropped
FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id
"""


def sql_pipeline_flagship(golden_path: str | None = None) -> str:
    """Expected-output oracle for the full pipeline: the committed full-row
    golden at the driver's correctness sf (0.01). Since round 7 the golden is
    produced by tools/gen_flagship_oracle_pure.py — a SPARK-FREE
    reimplementation of the pipeline (pure core kernels + plain-Python dedup
    verdicts) — so the flagship row is two independent implementations
    agreeing, not a self-pin (VERDICT r6 item 4). Explicit columns pin DuckDB
    types to the Spark schema."""
    if golden_path is None:
        golden_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", "tests", "golden", "flagship_oracle_sf001.json",
        )
        golden_path = os.path.normpath(golden_path)
    return f"""
SELECT url, scrubbed_text, pii_count, lang_pred, quality_score,
       relevance_score, recommendation, content_hash, simhash,
       difference_type
FROM read_json('{golden_path}', format='array', columns={{
  'url': 'VARCHAR', 'scrubbed_text': 'VARCHAR', 'pii_count': 'INTEGER',
  'lang_pred': 'VARCHAR', 'quality_score': 'DOUBLE',
  'relevance_score': 'DOUBLE', 'recommendation': 'VARCHAR',
  'content_hash': 'VARCHAR', 'simhash': 'BIGINT',
  'difference_type': 'VARCHAR'}})
"""


def sql_stratified_sample(cap: int = 100) -> str:
    """Shares the exact integer LCG keep/drop predicate with
    operators/sampling.py:stratified_sample (constants imported would be
    overkill: three literals, pinned here and there by the parity test)."""
    return f"""
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang, count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
WHERE ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648
      <= ({cap} * 2147483648 - 1) // n
"""
