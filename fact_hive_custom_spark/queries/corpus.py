"""Corpus-construction queries: chunking, n-gram statistics, inverted
index, and embedding quantization (SURVEY.md §2.2 LLM-pipeline surface).

The reference corpus (`/root/reference/fact-hive`) has no dataflow
operators (SURVEY.md §0); these extend the training-data-pipeline
surface the charter asks for: preparing documents for retrieval /
training (overlapping chunks), language-model count statistics
(bigrams), search-index construction (postings lists), and embedding
compression (int8 scalar quantization).

Cross-engine determinism rules (SURVEY.md §7.4):
- token positions are 1-based `element_at`/`list_extract` on both
  engines — never 0-based subscripts (Spark's `arr[i]` is 0-based,
  DuckDB's is 1-based; positional builtins avoid the trap);
- quantization rounds half-up via `floor(x + 0.5)` on doubles —
  `floor` is exact on IEEE doubles in both engines, while `round()`
  diverges on knife edges (Spark HALF_UPs the shortest-decimal repr,
  DuckDB rounds the binary double);
- everything emitted is int/string; no float leaves a query.
"""

from __future__ import annotations

from py4j.protocol import Py4JError
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fact_hive_custom_spark.materialize import materialize

from fact_hive_custom_spark.queries.registry import register
from fact_hive_custom_spark.tables import (
    EMB_CONTRACT_SQL,
    load_embeddings,
    load_table,
)

_CHUNK = 20  # tokens per chunk
_STRIDE = 15  # tokens between chunk starts (overlap = _CHUNK - _STRIDE)


@register(
    "q_llm_chunk_docs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, source, toks, n,
               unnest(generate_series(0, n - 1, {_STRIDE})) AS s
        FROM t
    )
    SELECT doc_id, source,
           CAST(s // {_STRIDE} AS BIGINT) AS chunk_id,
           CAST(least(s + {_CHUNK}, n) - s AS BIGINT) AS chunk_tokens,
           array_to_string(
               list_slice(toks, s + 1, least(s + {_CHUNK}, n)), ' '
           ) AS chunk_text
    FROM starts
    """,
)
def q_llm_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/training prep
    step that splits each document into 20-token (_CHUNK) chunks every
    15 (_STRIDE) tokens (fixed overlap keeps boundary context in two
    chunks, the standard RAG layout).

    Plan: pure per-row array work (split → generated starts → slice)
    fused into one codegen stage with the scan; the explode multiplies
    rows ~n/stride× but never shuffles — at 100 TB chunking is a
    map-only pass whose output partitioning inherits the input's, so a
    downstream embed/tokenize stage starts co-located."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.split(F.col("text"), " ").alias("toks"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    )
    s = t.select(
        "doc_id",
        "source",
        "toks",
        "n",
        F.explode(F.expr(f"sequence(0, n - 1, {_STRIDE})")).alias("s"),
    )
    return s.select(
        "doc_id",
        "source",
        F.expr(f"s DIV {_STRIDE}").cast("bigint").alias("chunk_id"),
        (F.least(F.col("s") + _CHUNK, F.col("n")) - F.col("s"))
        .cast("bigint")
        .alias("chunk_tokens"),
        F.expr(
            f"array_join(slice(toks, s + 1, least(s + {_CHUNK}, n) - s), ' ')"
        ).alias("chunk_text"),
    )


@register(
    "q_llm_ngram_counts",
    oracle="""
    WITH t AS (
        SELECT string_split(text, ' ') AS toks FROM documents
    ),
    bg AS (
        SELECT unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM t
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bg GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 100
    """,
)
def q_llm_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 bigram counts over the corpus — the n-gram LM statistic
    behind classic contamination checks and quality heuristics.

    Plan: bigrams are built per row with 1-based element_at (engine-
    portable indexing), one explode, one partial+final count
    aggregation, then sort+limit — Spark plans TakeOrderedAndProject,
    a distributed per-partition top-k with an O(k) driver merge, never
    a global sort. The (cnt DESC, bigram) key is unique per group row,
    so LIMIT is deterministic on both engines. At 100 TB the shuffle
    carries map-side-combined (bigram, count) partials only.

    Docs with <2 tokens are filtered out before the sequence() —
    Spark's sequence(1, 0) defaults to step -1 and yields [1, 0],
    whose index 0 would crash element_at, while DuckDB's
    generate_series(1, 0) is empty; the filter makes both engines
    emit nothing for them."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ',"
                "             element_at(toks, i + 1)))"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "bigram")
        .limit(100)
    )


@register(
    "q_llm_inverted_index",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    )
    SELECT term,
           COUNT(*) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM tok
    GROUP BY term
    HAVING COUNT(*) >= 20
    """,
)
def q_llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: term → document frequency + sorted
    postings list (serialized — the driver's hasher rejects arrays),
    restricted to terms appearing in ≥20 documents.

    Plan: explode → per-(term, doc) distinct → one groupBy(term) whose
    shuffle carries (term, doc_id) pairs, with the postings built by
    sort+join inside the aggregate. At 100 TB the skew risk is stop-
    words (a term in every doc); the df floor here is the report
    filter, and a production index would cap or shard hot terms
    exactly like dedup's hot-shingle cap (operators/dedup.py)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).distinct()
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.expr(
                "array_join(transform(array_sort(collect_list(doc_id)),"
                " x -> cast(x as string)), ',')"
            ).alias("postings"),
        )
        .filter(F.col("df") >= 20)
    )


@register(
    "q_llm_embed_quantize",
    oracle="""
    WITH s AS (
        SELECT vec_id, label, embedding,
               len(embedding) AS n_dims,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS scale
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, label, n_dims, scale,
               list_transform(embedding,
                   x -> CAST(floor((CAST(x AS DOUBLE) * 127) / scale + 0.5)
                        AS BIGINT)) AS qs
        FROM s WHERE scale > 0
    )
    SELECT vec_id, label, n_dims,
           CAST(list_sum(qs) AS BIGINT) AS q_sum,
           CAST(list_min(qs) AS BIGINT) AS q_min,
           CAST(list_max(qs) AS BIGINT) AS q_max,
           CAST(list_sum(list_transform(qs, v -> abs(v))) AS BIGINT) AS q_l1
    FROM q
    """,
)
def q_llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric scalar quantization of the embedding column —
    the 4× storage/bandwidth compression step before ANN serving —
    reported as integer per-vector summaries (sum / min / max / L1 of
    the quantized codes) that pin every code bit-for-bit.

    Rounding is floor(x + 0.5) on doubles (exact in IEEE on both
    engines); `round()` would diverge on .5 knife edges. Plan: one
    narrow map-only pass, all higher-order array functions in codegen,
    no shuffle, no Python — at 100 TB this is scan-bound, exactly what
    a quantization sweep should be."""
    e = load_table(spark, sf_dir, "embeddings")
    s = e.select(
        "vec_id",
        "label",
        "embedding",
        F.size("embedding").alias("n_dims"),
        F.expr(
            "array_max(transform(embedding, x -> abs(cast(x as double))))"
        ).alias("scale"),
    ).filter(F.col("scale") > 0)
    q = s.withColumn(
        "qs",
        F.expr(
            "transform(embedding,"
            " x -> cast(floor((cast(x as double) * 127) / scale + 0.5)"
            " as bigint))"
        ),
    )
    return q.select(
        "vec_id",
        "label",
        "n_dims",
        F.expr("aggregate(qs, 0L, (a, v) -> a + v)").alias("q_sum"),
        F.array_min("qs").alias("q_min"),
        F.array_max("qs").alias("q_max"),
        F.expr("aggregate(qs, 0L, (a, v) -> a + abs(v))").alias("q_l1"),
    )


_BM25_TERMS = ("join", "hash", "scan")  # in-corpus query terms
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "q_llm_bm25_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok
        WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
        WHERE term IN ('join', 'hash', 'scan') GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(
                   ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * (tf.tf * ({_BM25_K1} + 1))
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                      + {_BM25_B} * dl.dl / stats.avgdl)),
               6) AS bm25
        FROM tf
        JOIN dfreq ON tf.term = dfreq.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
    )
    SELECT term, doc_id, bm25
    FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY term ORDER BY bm25 DESC, doc_id) <= 10
    """,
)
def q_llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (k1=1.2, b=0.75): top-10 documents per
    query term — the lexical-retrieval baseline every RAG corpus needs
    next to its ANN index.

    Plan: SINGLE corpus pass — one token explode feeds a per-doc
    conditional aggregation (doc length + one tf counter per query
    term in the same groupBy), so the corpus is tokenized once and
    shuffles once on doc_id with map-side partial aggregation. The
    (n_docs, avgdl, per-term df) scalar derives from that frame and
    broadcasts back; stack() unpivots the tf columns into (term, tf,
    df) rows for scoring. Ranking is per-term row_number over the
    ROUNDED score with a doc_id tiebreak — deterministic on both
    engines. (The relational oracle recomputes tf/df/dl from scratch —
    same numbers, different plan; the driver compares values only.)"""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    # persisted: feeds both the corpus-stats scalar and the scoring
    # unpivot — without it the tokenize+aggregate pass runs twice
    # (observed as two doc_id exchanges in the plan). One row per doc
    # (id + 4 longs ≈ 40 B), so the cache is corpus-count-sized, not
    # corpus-sized. Released by Spark's LRU, same policy as
    # operators/dedup.py.
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    triplets = ", ".join(
        f"'{t}', tf_{t}, df_{t}" for t in _BM25_TERMS
    )
    unpivoted = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "dl",
            "n_docs",
            "avgdl",
            F.expr(
                f"stack({len(_BM25_TERMS)}, {triplets}) AS (term, tf, df)"
            ),
        )
        .filter(F.col("tf") > 0)
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (_BM25_K1 + 1)) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = unpivoted.select(
        "term", "doc_id", F.round(idf * tf_norm, 6).alias("bm25")
    )
    w = Window.partitionBy("term").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("term", "doc_id", "bm25")
    )


@register(
    "q_llm_heavy_hitters",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    c AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token)
    SELECT token, cnt,
           CAST((cnt * 1000000) // tot.n AS BIGINT) AS share_ppm
    FROM c CROSS JOIN tot
    WHERE cnt * 200 >= tot.n
    """,
)
def q_llm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: tokens holding ≥ 0.5% of all token mass,
    with exact integer ppm shares — the stop-word / boilerplate
    detector that feeds dedup's hot-shingle cap and the inverted
    index's df floor.

    All-integer arithmetic (share_ppm = cnt*1e6 DIV total — both
    engines truncate non-negative integer division identically). Plan:
    one map-side-combined token count shuffle; the scalar total
    broadcasts into the filter, so output is the (tiny) heavy-hitter
    set regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    c = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        c.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * 200 >= F.col("n"))
        .select(
            "token",
            "cnt",
            F.expr("(cnt * 1000000) DIV n").cast("bigint").alias("share_ppm"),
        )
    )


@register(
    "q_llm_dedup_survivor",
    oracle="""
    WITH h AS (
        SELECT doc_id, n_chars,
               sha256(array_to_string(list_sort(list_transform(
                   list_distinct(string_split(text, ' ')),
                   t -> md5(t))), '')) AS text_hash
        FROM documents WHERE text IS NOT NULL
    ),
    r AS (
        SELECT doc_id, text_hash,
               CAST(row_number() OVER (
                   PARTITION BY text_hash
                   ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn,
               CAST(first_value(doc_id) OVER (
                   PARTITION BY text_hash
                   ORDER BY n_chars DESC, doc_id) AS BIGINT) AS survivor_id,
               CAST(COUNT(*) OVER (PARTITION BY text_hash) AS BIGINT)
                   AS cluster_size
        FROM h
    )
    SELECT doc_id, survivor_id, cluster_size
    FROM r WHERE rn > 1
    """,
)
def q_llm_dedup_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster survivorship: within each content-fingerprint
    cluster, keep the document with the most content (n_chars DESC,
    doc_id tiebreak) and emit one row per DROPPED document with its
    survivor — the policy-bearing step between duplicate detection and
    the actual delete, and the audit trail a compliance review asks
    for.

    The cluster key is a bag-of-words fingerprint: sha256 over the
    sorted md5s of the document's distinct tokens. It subsumes exact
    duplicates (identical text ⇒ identical vocabulary) and also
    clusters token-reordered/repeated copies — and hashing each token
    BEFORE sorting keeps the sort over ASCII hex, immune to
    engine-collation differences on unicode tokens (the round-3/4
    fixture-drift class). NULL texts are excluded on both engines.

    One window shuffle on the 256-bit fingerprint (uniform, unskewed);
    the text column never shuffles — only hash, id, and length. Output
    is proportional to the duplicate mass, not the corpus. The same
    survivor policy applies unchanged to MinHash/CC clusters by
    swapping the partition key for the connected-component id from
    operators/graph.py (q_llm_dedup_clusters).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    fingerprint = F.sha2(
        F.array_join(
            F.array_sort(
                F.transform(
                    F.array_distinct(F.split(F.col("text"), " ")),
                    lambda t: F.md5(t),
                )
            ),
            "",
        ),
        256,
    )
    h = d.select("doc_id", "n_chars", fingerprint.alias("text_hash"))
    w = Window.partitionBy("text_hash").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    r = h.select(
        "doc_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.first_value("doc_id").over(w).cast("bigint").alias("survivor_id"),
        F.count(F.lit(1))
        .over(Window.partitionBy("text_hash"))
        .cast("bigint")
        .alias("cluster_size"),
    )
    return r.filter(F.col("rn") > 1).select(
        "doc_id", "survivor_id", "cluster_size"
    )


_EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "q_llm_pii_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact: user' || CAST(doc_id AS VARCHAR)
                    || '@example.com ph 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS full_text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(full_text, '{_EMAIL_RE}'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(full_text, '{_PHONE_RE}'))
                AS BIGINT) AS n_phones,
           CAST(length(regexp_replace(regexp_replace(
                    full_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                    '{_PHONE_RE}', '<PHONE>', 'g')) AS BIGINT)
               AS redacted_len,
           right(regexp_replace(regexp_replace(
                    full_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                    '{_PHONE_RE}', '<PHONE>', 'g'), 40) AS redacted_tail
    FROM aug
    """,
)
def q_llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and mask email/phone patterns via
    regexp_count + regexp_replace — the compliance scrub every
    training-data pipeline runs before a corpus leaves quarantine.

    The fixture's synthetic text contains no PII, so each document is
    deterministically augmented with one email and one phone built
    from doc_id — both engines construct the identical string, making
    the redaction behavior (not just the no-op) oracle-checked. The
    patterns stay in the RE2 ∩ Java-regex common subset (character
    classes, no lookaround) so Spark and DuckDB match identically.

    Scale: pure map-side regex inside WholeStageCodegen — no shuffle,
    no Python. Pattern lists grow (SSN, IBAN, addresses) by chaining
    regexp_replace calls or folding over a pattern array; cost stays
    one scan.
    """
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ph 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("full_text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("full_text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("full_text"), F.lit(_EMAIL_RE))
        .cast("bigint")
        .alias("n_emails"),
        F.regexp_count(F.col("full_text"), F.lit(_PHONE_RE))
        .cast("bigint")
        .alias("n_phones"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
        F.expr("right(" + "regexp_replace(regexp_replace(full_text, "
               f"'{_EMAIL_RE}', '<EMAIL>'), '{_PHONE_RE}', '<PHONE>')"
               + ", 40)").alias("redacted_tail"),
    )


_EDIT_PREFIX = 80  # chars of each doc compared; bounds the O(n²) DP


@register(
    "q_llm_edit_distance",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               left(regexp_replace(text, '[^\\x20-\\x7e]', '', 'g'),
                    {_EDIT_PREFIX}) AS head
        FROM documents
        WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    p AS (
        SELECT doc_id, source, head,
               lead(doc_id) OVER w AS next_id,
               lead(head)   OVER w AS next_head
        FROM d
        WINDOW w AS (PARTITION BY source ORDER BY doc_id)
    ),
    m AS (
        SELECT doc_id, next_id, source,
               CAST(levenshtein(head, next_head) AS BIGINT) AS edit_dist,
               CAST(greatest(length(head), length(next_head)) AS BIGINT)
                   AS max_len
        FROM p WHERE next_id IS NOT NULL
    )
    SELECT doc_id, next_id, source, edit_dist,
           CASE WHEN max_len = 0 THEN 1000000
                ELSE ((max_len - edit_dist) * 1000000) // max_len
           END AS sim_ppm
    FROM m
    """,
)
def q_llm_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity between neighboring documents of the
    same source — the character-level near-dup verifier that catches
    template/boilerplate families token-level Jaccard misses (one-char
    diffs in every token still score ~1.0 here). Pairing is
    lead-by-doc_id within source: the bounded O(n) candidate chain a
    crawler's natural ingest order gives, standing in for dedup's LSH
    candidates (operators/dedup.py emits exactly such pairs at scale).

    Cross-engine determinism: DuckDB's levenshtein counts BYTES while
    Spark's counts CHARACTERS, so both engines first strip the text to
    printable ASCII (identical regex, 'g' flag on the DuckDB side
    because its regexp_replace is first-match by default) where the two
    units coincide; the DP is bounded to the first {_EDIT_PREFIX} chars
    per doc. Similarity is ppm integer division (truncating on both
    engines); NULL text/source rows are quarantined.

    Scale: one window shuffle on source, then a map-only levenshtein
    pass over consecutive pairs — O(n·{_EDIT_PREFIX}²) total, never a
    cross-product. At 100 TB the same shape runs over LSH candidate
    pairs instead of neighbors: a join-then-map with identical cost
    character."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select(
            "doc_id",
            "source",
            F.expr(
                "left(regexp_replace(text, '[^\\\\x20-\\\\x7e]', ''),"
                f" {_EDIT_PREFIX})"
            ).alias("head"),
        )
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    p = d.select(
        "doc_id",
        "source",
        "head",
        F.lead("doc_id").over(w).alias("next_id"),
        F.lead("head").over(w).alias("next_head"),
    ).filter(F.col("next_id").isNotNull())
    m = p.select(
        "doc_id",
        "next_id",
        "source",
        F.levenshtein("head", "next_head").cast("bigint").alias("edit_dist"),
        F.greatest(F.length("head"), F.length("next_head"))
        .cast("bigint")
        .alias("max_len"),
    )
    return m.select(
        "doc_id",
        "next_id",
        "source",
        "edit_dist",
        F.when(F.col("max_len") == 0, F.lit(1000000).cast("bigint"))
        .otherwise(
            F.expr("((max_len - edit_dist) * 1000000) DIV max_len")
        )
        .cast("bigint")
        .alias("sim_ppm"),
    )


@register(
    "q_llm_bigram_lm",
    oracle="""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    pairs AS (
        SELECT unnest(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
        FROM toks
    ),
    bg AS (
        SELECT p.w1 AS w1, p.w2 AS w2 FROM pairs
    ),
    counted AS (
        SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY w1, w2
    )
    SELECT w1, w2, cnt,
           CAST(1000000 * cnt // SUM(cnt) OVER (PARTITION BY w1) AS BIGINT)
               AS cond_ppm
    FROM counted
    ORDER BY cnt DESC, w1, w2
    LIMIT 100
    """,
)
def q_llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics: P(w2|w1) as integer parts-per-
    million over the corpus — the conditional-probability table behind
    n-gram LM scoring, next-token surprisal filters, and boilerplate
    detection (a near-1.0 conditional is a frozen phrase).

    Plan: bigrams explode map-side, ONE partial+final count keyed on
    (w1, w2), then a single window partitioned by w1 computes the
    denominator — the window key is a prefix of the aggregation key,
    so AQE coalesces onto the exchange the groupBy already produced
    (no second wide shuffle). The probability is exact-integer
    (1e6·cnt DIV total): Spark `DIV` and DuckDB `//` both truncate,
    so no float crosses an engine boundary. Final top-100 is
    TakeOrderedAndProject with the (cnt, w1, w2) unique tiebreak.
    At 100 TB the shuffle carries map-combined (bigram, count) pairs
    only — never document text."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1,"
                "             element_at(toks, i + 1) AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    counted = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counted.withColumn("tot", F.sum("cnt").over(Window.partitionBy("w1")))
        .withColumn(
            "cond_ppm",
            F.expr("CAST(1000000 * cnt AS BIGINT) DIV tot").cast("bigint"),
        )
        .drop("tot")
        .orderBy(F.desc("cnt"), "w1", "w2")
        .limit(100)
    )


_RRF_K = 60  # reciprocal-rank-fusion constant (Cormack et al. SIGIR'09)
_RRF_DEPTH = 50  # per-list candidate depth
_RRF_TERM = "join"  # in-corpus lexical query term
_RRF_PROBE = 0  # probe vector id (doc_id-aligned)


@register(
    "q_llm_hybrid_rrf",
    oracle=f"""
    WITH emb AS ({EMB_CONTRACT_SQL}),
    probe AS (SELECT embedding FROM emb WHERE vec_id = {_RRF_PROBE}),
    vecrank AS (
        SELECT c.vec_id AS doc_id,
               row_number() OVER (
                   ORDER BY ROUND(list_cosine_similarity(
                       CAST(c.embedding AS DOUBLE[]),
                       CAST((SELECT embedding FROM probe) AS DOUBLE[])), 6)
                       DESC, c.vec_id) AS rv
        FROM emb c WHERE c.vec_id <> {_RRF_PROBE}
        QUALIFY rv <= {_RRF_DEPTH}
    ),
    lexrank AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY tf DESC, doc_id) AS rl
        FROM (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '),
                                   t -> t = '{_RRF_TERM}')) AS tf
            FROM documents WHERE text IS NOT NULL
        ) WHERE tf >= 1
        QUALIFY rl <= {_RRF_DEPTH}
    )
    SELECT COALESCE(v.doc_id, l.doc_id) AS doc_id,
           CAST(COALESCE(1000000 // ({_RRF_K} + l.rl), 0)
                + COALESCE(1000000 // ({_RRF_K} + v.rv), 0) AS BIGINT)
               AS rrf_e6
    FROM vecrank v FULL JOIN lexrank l ON v.doc_id = l.doc_id
    ORDER BY rrf_e6 DESC, doc_id
    LIMIT 10
    """,
)
def q_llm_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: a lexical
    term-frequency ranking and a dense cosine ranking, fused as
    Σ 1/(60 + rank) over the two top-50 lists (Cormack et al.,
    SIGIR'09) — the standard RAG retrieval stack (BM25-side +
    ANN-side) reduced to its rank-fusion core.

    Determinism/scale: the lexical tf is computed MAP-SIDE with a
    higher-order filter over the token array (no explode, no shuffle
    of tokens); the dense side broadcasts the single probe vector and
    scores in codegen (functions/vectors.py fold), ranking by ROUND 6dp
    with the vec_id tiebreak on BOTH engines. Fusion itself is exact
    integer (1e6 DIV (k + rank)), so no float leaves the ranking
    stage. Each ranking is a top-{_RRF_DEPTH} TakeOrdered heap, the
    fusion join touches ≤ 2·{_RRF_DEPTH} rows, and at 100 TB the two
    source rankings are the ONLY corpus passes — the fuse is free."""
    from fact_hive_custom_spark.functions.vectors import cosine
    from fact_hive_custom_spark.tables import load_embeddings

    emb = load_embeddings(spark, sf_dir)
    probe = emb.filter(F.col("vec_id") == _RRF_PROBE).select(
        F.col("embedding").alias("probe_vec")
    )
    scored = (
        emb.filter(F.col("vec_id") != _RRF_PROBE)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("probe_vec")), 6).alias(
                "cos"
            ),
        )
    )
    # limit FIRST (TakeOrderedAndProject: per-partition heap + O(k)
    # driver merge), THEN rank — a row_number over a global window
    # would funnel the whole corpus into one partition to select 50
    vec_top = scored.orderBy(F.desc("cos"), F.asc("doc_id")).limit(_RRF_DEPTH)
    vecrank = vec_top.withColumn(
        "rv", F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("doc_id")))
    ).select("doc_id", "rv")
    lex = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.col("text"), " "),
                    lambda t: t == F.lit(_RRF_TERM),
                )
            ).alias("tf"),
        )
        .filter(F.col("tf") >= 1)
    )
    lex_top = lex.orderBy(F.desc("tf"), F.asc("doc_id")).limit(_RRF_DEPTH)
    lexrank = lex_top.withColumn(
        "rl", F.row_number().over(Window.orderBy(F.desc("tf"), F.asc("doc_id")))
    ).select("doc_id", "rl")
    return (
        vecrank.join(lexrank, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(
                    F.expr(f"CAST(1000000 AS BIGINT) DIV ({_RRF_K} + rl)"),
                    F.lit(0),
                )
                + F.coalesce(
                    F.expr(f"CAST(1000000 AS BIGINT) DIV ({_RRF_K} + rv)"),
                    F.lit(0),
                )
            )
            .cast("bigint")
            .alias("rrf_e6"),
        )
        .orderBy(F.desc("rrf_e6"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "q_llm_bpe_pairs",
    oracle="""
    WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL
    ),
    wf AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wf
        FROM w WHERE length(word) >= 2 GROUP BY word
    ),
    p AS (
        SELECT substr(word, CAST(unnest(generate_series(1, length(word) - 1))
                            AS INT), 2) AS pair,
               wf
        FROM wf
    ),
    agg AS (
        SELECT pair, CAST(SUM(wf) AS BIGINT) AS pair_count
        FROM p GROUP BY pair
    )
    SELECT pair,
           substr(pair, 1, 1) AS left_sym,
           substr(pair, 2, 1) AS right_sym,
           pair_count,
           CAST(row_number() OVER (ORDER BY pair_count DESC, pair)
                AS BIGINT) AS merge_rank
    FROM agg
    QUALIFY merge_rank <= 20
    ORDER BY merge_rank
    """,
)
def q_llm_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge induction, round one: the 20 most
    frequent adjacent character pairs weighted by word frequency — the
    statistic a BPE/WordPiece tokenizer trainer computes to pick its
    next merge (Sennrich et al. 2016's counting step, re-expressed as
    two aggregations).

    The scale trick is the order of aggregation: the corpus collapses
    to its WORD-FREQUENCY table first (one token explode + groupBy —
    the same shuffle q_llm_heavy_hitters pays), and pair extraction
    then runs over |vocab| rows, not |corpus| tokens. At 100 TB the
    vocab is ~1e7 rows regardless of corpus size, so every later BPE
    round is constant-cost — this is why real tokenizer trainers
    precompute word counts. The pair space itself is ≤|charset|², so
    the final ranking window is over a broadcast-sized relation; the
    sequence() guard (length ≥ 2) matters because Spark's
    sequence(1, 0) yields a DESCENDING [1, 0], not an empty array.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    wf = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wf"))
    )
    pairs = wf.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "wf",
    )
    agg = pairs.groupBy("pair").agg(F.sum("wf").cast("bigint").alias("pair_count"))
    ranked = agg.select(
        "pair",
        F.substring("pair", 1, 1).alias("left_sym"),
        F.substring("pair", 2, 1).alias("right_sym"),
        "pair_count",
        F.row_number()
        .over(Window.orderBy(F.desc("pair_count"), F.asc("pair")))
        .cast("bigint")
        .alias("merge_rank"),
    )
    return ranked.filter(F.col("merge_rank") <= 20).orderBy("merge_rank")


# Deterministic noisy-URL builder shared by the Spark and oracle sides
# of q_llm_url_canonical: four crawl-noise variants keyed on the
# 40-block index (doc_id DIV 40) % 4 — NOT doc_id % 4, which is fully
# determined by the page identity doc_id % 40 (40 ≡ 0 mod 4) and would
# give every page a single variant, making the collapse vacuous —
# variants: uppercase host + explicit default port / trailing slash +
# utm prefix param / utm suffix param + fragment, all resolving to the
# same page identity doc_id % 40, so canonicalization provably
# collapses 4 raw forms per page (asserted in tests).
_URL_VARIANT_SQL = """
    CASE CAST((doc_id {div} 40) % 4 AS INT)
        WHEN 1 THEN 'HTTPS://Corpus.Example:443/p/' || CAST(doc_id % 40 AS {i})
                    || '?id=' || CAST(doc_id % 40 AS {i})
        WHEN 2 THEN 'https://corpus.example/p/' || CAST(doc_id % 40 AS {i})
                    || '/?utm_source=feed&id=' || CAST(doc_id % 40 AS {i})
        WHEN 3 THEN 'https://corpus.example/p/' || CAST(doc_id % 40 AS {i})
                    || '?id=' || CAST(doc_id % 40 AS {i}) || '&utm_campaign=x#frag'
        ELSE 'https://corpus.example/p/' || CAST(doc_id % 40 AS {i})
             || '?id=' || CAST(doc_id % 40 AS {i})
    END
"""


@register(
    "q_llm_url_canonical",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_URL_VARIANT_SQL.format(i="VARCHAR", div="//")} AS url
        FROM documents
    ),
    s1 AS (
        SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag
        FROM raw
    ),
    s2 AS (
        SELECT doc_id, url,
               regexp_replace(
                   regexp_replace(
                       lower(regexp_extract(nofrag, '^[a-zA-Z]+://[^/?]*', 0)),
                       ':443$', ''),
                   '^http://(.*)$', 'https://\\1') AS schemehost,
               regexp_replace(
                   regexp_extract(regexp_replace(nofrag, '^[a-zA-Z]+://[^/?]*', ''),
                                  '^[^?]*', 0),
                   '/+$', '') AS path,
               CASE WHEN contains(nofrag, '?')
                    THEN regexp_extract(nofrag, '\\?(.*)$', 1) ELSE '' END AS q
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, url,
               schemehost
               || (CASE WHEN path = '' THEN '/' ELSE path END)
               || (CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) AS canonical_url
        FROM (
            SELECT doc_id, url, schemehost, path,
                   array_to_string(
                       list_sort(list_filter(string_split(q, '&'),
                                 x -> x <> '' AND NOT starts_with(x, 'utm_'))),
                       '&') AS cq
            FROM s2
        )
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
           MIN(doc_id) AS keep_doc
    FROM s3
    GROUP BY canonical_url
    """,
)
def q_llm_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup — the first dedup a web-crawl pipeline runs,
    BEFORE any content hashing: strip the fragment, lowercase
    scheme+host, drop the default port, upgrade http→https, strip
    trailing slashes, drop utm_* tracking params, and sort the
    surviving query params; then group by the canonical form. URLs are
    built deterministically from doc_id (four noise variants that
    provably collapse 4→1) so both engines canonicalize identical
    strings — the capability under test is the normalization chain and
    the dedup shape, not a fetcher.

    At 100 TB: canonicalization is a map-only regex/array chain fused
    into the scan (zero exchanges until the groupBy), and the dedup
    shuffles only the canonical-URL hash — the same
    narrow-exchange posture as q_llm_exact_dedup. Param sorting uses
    array_sort/list_sort (both engines sort strings bytewise), so the
    canonical form is order-stable across crawlers that emit params in
    different orders."""
    d = load_table(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id", F.expr(_URL_VARIANT_SQL.format(i="STRING", div="DIV")).alias("url")
    )
    s1 = raw.withColumn("nofrag", F.regexp_replace("url", "#.*$", ""))
    s2 = s1.select(
        "doc_id",
        "url",
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.regexp_extract("nofrag", "^[a-zA-Z]+://[^/?]*", 0)),
                ":443$",
                "",
            ),
            "^http://(.*)$",
            "https://$1",
        ).alias("schemehost"),
        F.regexp_replace(
            F.regexp_extract(
                F.regexp_replace("nofrag", "^[a-zA-Z]+://[^/?]*", ""),
                "^[^?]*",
                0,
            ),
            "/+$",
            "",
        ).alias("path"),
        F.when(
            F.col("nofrag").contains("?"),
            F.regexp_extract("nofrag", "\\?(.*)$", 1),
        )
        .otherwise(F.lit(""))
        .alias("q"),
    )
    s3 = s2.select(
        "doc_id",
        "url",
        F.concat(
            F.col("schemehost"),
            F.when(F.col("path") == "", F.lit("/")).otherwise(F.col("path")),
            F.expr(
                "CASE WHEN array_join(array_sort(filter(split(q, '&'),"
                " x -> x <> '' AND NOT startswith(x, 'utm_'))), '&') <> ''"
                " THEN '?' || array_join(array_sort(filter(split(q, '&'),"
                " x -> x <> '' AND NOT startswith(x, 'utm_'))), '&')"
                " ELSE '' END"
            ),
        ).alias("canonical_url"),
    )
    return s3.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_variants"),
        F.countDistinct("url").cast("bigint").alias("n_raw_forms"),
        F.min("doc_id").alias("keep_doc"),
    )


# q_llm_bpe_train: the iterative step q_llm_bpe_pairs only ranks.
# Symbol sequences are encoded as '~~'-separated strings ('der' →
# 'd~~e~~r'; the corpus is lowercase a-z, SURVEY §1.2, so '~' never
# collides) because applying a merge then becomes ONE plain
# replace(enc, a||'~~'||b, a||b) — and replace's leftmost-
# non-overlapping scan IS the BPE merge rule ('e~~e~~e' + (e,e) →
# 'ee~~e'), verified identical in Spark and DuckDB. A fold-based
# array rewrite would need a struct-accumulator HOF Spark has but
# DuckDB's list_reduce cannot express.
# Previous q_llm_bpe_train invocation's persisted vocab tables —
# released at the next invocation (see its docstring, Cache hygiene).
_BPE_TRAIN_CACHE: list = []

_BPE_ORACLE_ROUND = """
    p{r} AS (
        SELECT list_extract(s, CAST(i AS INT)) AS a,
               list_extract(s, CAST(i AS INT) + 1) AS b,
               CAST(SUM(wf) AS BIGINT) AS pair_count
        FROM (
            SELECT string_split(enc, '~~') AS s, wf,
                   unnest(generate_series(
                       1, len(string_split(enc, '~~')) - 1)) AS i
            FROM {src} WHERE len(string_split(enc, '~~')) >= 2
        )
        GROUP BY 1, 2
    ),
    m{r} AS (
        SELECT a, b, pair_count FROM p{r}
        QUALIFY row_number() OVER (ORDER BY pair_count DESC, a, b) = 1
    ),
    w{r} AS (
        SELECT replace(enc, m{r}.a || '~~' || m{r}.b, m{r}.a || m{r}.b)
                   AS enc,
               wf
        FROM {src}, m{r}
    )"""


@register(
    "q_llm_bpe_train",
    oracle=f"""
    WITH w0 AS (
        SELECT array_to_string(string_split(word, ''), '~~') AS enc,
               CAST(COUNT(*) AS BIGINT) AS wf
        FROM (
            SELECT unnest(string_split(text, ' ')) AS word
            FROM documents WHERE text IS NOT NULL
        ) WHERE word <> '' GROUP BY word
    ),
    {_BPE_ORACLE_ROUND.format(r=1, src="w0")},
    {_BPE_ORACLE_ROUND.format(r=2, src="w1")},
    {_BPE_ORACLE_ROUND.format(r=3, src="w2")}
    SELECT CAST(1 AS BIGINT) AS merge_round, a AS merge_a, b AS merge_b,
           pair_count FROM m1
    UNION ALL
    SELECT CAST(2 AS BIGINT), a, b, pair_count FROM m2
    UNION ALL
    SELECT CAST(3 AS BIGINT), a, b, pair_count FROM m3
    ORDER BY merge_round
    """,
)
def q_llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, three full merge rounds: each round
    counts adjacent symbol pairs over the word-frequency table, elects
    the most frequent pair (count desc, then lexicographic — the
    deterministic tie rule), APPLIES the merge to every word, and
    recounts on the merged symbols — the actual Sennrich et al. loop,
    not just its first statistic (q_llm_bpe_pairs).

    The data-dependent merge choice never touches the driver: each
    round's winner is a limit(1) TakeOrdered whose single row is
    broadcast-cross-joined back onto the vocab so the replace() runs
    distributed — the same 1×n attach shape as q_llm_semdedup's pivot
    row. Rounds chain as one lazy plan; every stage after the initial
    corpus→vocab collapse is O(|vocab|) (see SCALING.md §Round-8b), so
    at 100 TB adding merge rounds adds constant-sized stages, not
    corpus passes. The sequence(1, size-1) guard drops fully-merged
    single-symbol words per round (Spark's sequence(1, 0) yields a
    DESCENDING [1,0], not an empty array).

    Cache hygiene: the contract returns a LAZY DataFrame, so this
    call can't unpersist its own four vocab tables before the caller
    materializes them. Instead each invocation releases the PREVIOUS
    invocation's tables (module-level handle list), bounding the
    session-lifetime footprint to one generation — repeated builds in
    the parity suite / plan audit / bench no longer accumulate.
    Unpersisting never breaks correctness (a stale handle would just
    recompute)."""
    _wf0, outs, _wf3 = _bpe_train_parts(spark, sf_dir)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("merge_round")


def _bpe_train_parts(spark: SparkSession, sf_dir: str):
    """Shared BPE training core (q_llm_bpe_train, q_llm_bpe_tokenize):
    returns (wf0, outs, wf3) — the initial '~~'-encoded
    word-frequency table, the three per-round merge-winner
    DataFrames, and the vocab after all three merges applied. See
    q_llm_bpe_train's docstring for the plan and cache discipline."""
    for h in _BPE_TRAIN_CACHE:
        try:
            h.unpersist()
        except Py4JError:
            pass  # stale handle from a stopped session — nothing to free
    _BPE_TRAIN_CACHE.clear()
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    wf = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wf"))
        .select(
            F.expr("array_join(split(word, ''), '~~')").alias("enc"), "wf"
        )
        # Without the per-round persist the final 3-branch union is a
        # TREE: round r's plan embeds every earlier round's argmax AND
        # vocab-transform subtrees, so the corpus explode re-runs ~2^r
        # times (measured 11.3 s at sf0.01). Persisting pins each
        # round's |vocab|-sized table: one corpus pass, O(R) tiny
        # vocab stages after it (0.9 s).
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _BPE_TRAIN_CACHE.append(wf)
    wf0 = wf
    outs = []
    for r in (1, 2, 3):
        syms = wf.select("wf", F.split("enc", "~~").alias("s")).filter(
            F.size("s") >= 2
        )
        pairs = syms.select(
            "wf",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 1),"
                    " i -> struct(element_at(s, i) AS a,"
                    " element_at(s, i + 1) AS b))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(
                F.col("p.a").alias("a"), F.col("p.b").alias("b")
            )
            .agg(F.sum("wf").cast("bigint").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(1)
        )
        outs.append(
            best.select(
                F.lit(r).cast("bigint").alias("merge_round"),
                F.col("a").alias("merge_a"),
                F.col("b").alias("merge_b"),
                "pair_count",
            )
        )
        wf = wf.crossJoin(
            F.broadcast(
                best.select(F.col("a").alias("ma"), F.col("b").alias("mb"))
            )
        ).select(
            F.expr("replace(enc, ma || '~~' || mb, ma || mb)").alias("enc"),
            "wf",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _BPE_TRAIN_CACHE.append(wf)
    return wf0, outs, wf


_BPE_TOKENIZE_W0 = """w0 AS (
        SELECT array_to_string(string_split(word, ''), '~~') AS enc,
               CAST(COUNT(*) AS BIGINT) AS wf
        FROM (
            SELECT unnest(string_split(text, ' ')) AS word
            FROM documents WHERE text IS NOT NULL
        ) WHERE word <> '' GROUP BY word
    )"""


@register(
    "q_llm_bpe_tokenize",
    oracle=f"""
    WITH {_BPE_TOKENIZE_W0},
    {_BPE_ORACLE_ROUND.format(r=1, src="w0")},
    {_BPE_ORACLE_ROUND.format(r=2, src="w1")},
    {_BPE_ORACLE_ROUND.format(r=3, src="w2")}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(wf) AS BIGINT) AS whitespace_tokens,
           (SELECT CAST(SUM(len(string_split(enc, '~~')) * wf) AS BIGINT)
            FROM w0) AS char_symbols,
           CAST(SUM(len(string_split(enc, '~~')) * wf) AS BIGINT)
               AS bpe_symbols,
           CAST(1000000 * ((SELECT SUM(len(string_split(enc, '~~')) * wf)
                            FROM w0)
                           - SUM(len(string_split(enc, '~~')) * wf))
                // (SELECT SUM(len(string_split(enc, '~~')) * wf) FROM w0)
               AS BIGINT) AS saved_ppm
    FROM w3
    """,
)
def q_llm_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLY as an operator: run the trained 3-round merge list
    over the corpus (the re-entrant replace-encoding shared with
    q_llm_bpe_train via _bpe_train_parts) and report the compression
    ledger a tokenizer rollout needs: distinct words, whitespace
    token count, character-symbol count before any merge, BPE symbol
    count after the merges, and the exact-integer ppm saved vs the
    character baseline.

    Plan: tokenization happens on the WORD-FREQUENCY table, never the
    raw corpus — applying a merge list is O(|vocab|) regardless of
    corpus size (the measured 8.3× vocab-first lesson, SCALING.md
    §Round-8b), and each summary is a map-combined 1-row aggregate
    over the persisted per-round vocab (InMemoryTableScan — zero
    extra corpus passes beyond q_llm_bpe_train's one). The two 1-row
    frames meet in a broadcast attach. At 100 TB the corpus cost is
    the single explode+groupBy building the vocab; everything after
    is constant-sized."""
    wf0, _outs, wf3 = _bpe_train_parts(spark, sf_dir)
    s0 = wf0.agg(
        F.sum(F.expr("size(split(enc, '~~')) * wf"))
        .cast("bigint")
        .alias("char_symbols")
    )
    s3 = wf3.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("wf").cast("bigint").alias("whitespace_tokens"),
        F.sum(F.expr("size(split(enc, '~~')) * wf"))
        .cast("bigint")
        .alias("bpe_symbols"),
    )
    return s3.crossJoin(F.broadcast(s0)).select(
        "n_words",
        "whitespace_tokens",
        "char_symbols",
        "bpe_symbols",
        F.expr(
            "CAST(1000000 * (char_symbols - bpe_symbols) AS BIGINT)"
            " DIV char_symbols"
        )
        .cast("bigint")
        .alias("saved_ppm"),
    )


# Product-quantization family (q_llm_pq_codes, q_llm_ivfpq_topk)
# constants: 64-dim contract → M=8 subspaces × 8 dims, K=16 centroids
# per subspace (the 16 smallest vec_ids — deterministic and
# SQL-expressible on both engines, unlike the hashed-pivot family
# whose xxhash64 DuckDB cannot reproduce). Distances are computed on
# int8-quantized components (global scale), so every argmin/ranking
# compares EXACT integers — no float last-ulp ordering risk.
_PQ_M = 8
_PQ_SUB = 8
_PQ_K = 16

# Shared oracle CTE chain: contract → global scale → int8 grid →
# centroid table → subvector explodes → per-(vector, subspace,
# centroid) integer L2² → per-(vector, subspace) argmin code.
# Parameterized on the centroids-per-subspace dial (pq_k), the
# subspace-count dial (pq_m — M=16 gives 4-dim cells), and the
# OPQ-lite stride permutation (opq — the DuckDB mirror of
# _opq_perm_expr) so the tuned serving query (q_llm_ann_tuned)
# shares the exact machinery at any measured operating point.
def _pq_cte_prefix(
    pq_k: int = _PQ_K, pq_m: int = _PQ_M, opq: bool = False
) -> str:
    d = _PQ_M * _PQ_SUB
    pq_sub = d // pq_m
    if opq:
        qs_expr = (
            f"list_transform(generate_series(0, {d - 1}),"
            " p -> list_extract(qs0, CAST(p // "
            f"{pq_sub} + (p % {pq_sub}) * {pq_m} + 1 AS INT)))"
        )
        q_cte = f"""q0 AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor((CAST(x AS DOUBLE) * 127) / gscale + 0.5)
                        AS BIGINT)) AS qs0
        FROM emb, g WHERE gscale > 0
    ),
    q AS (
        SELECT vec_id, {qs_expr} AS qs FROM q0
    )"""
    else:
        q_cte = """q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor((CAST(x AS DOUBLE) * 127) / gscale + 0.5)
                        AS BIGINT)) AS qs
        FROM emb, g WHERE gscale > 0
    )"""
    return f"""emb AS ({EMB_CONTRACT_SQL}),
    g AS (
        SELECT max(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))))) AS gscale
        FROM emb
    ),
    {q_cte},
    cent AS (
        SELECT vec_id AS cid, qs AS cqs FROM q
        QUALIFY row_number() OVER (ORDER BY vec_id) <= {pq_k}
    ),
    sub AS (
        SELECT vec_id, CAST(m AS BIGINT) AS m,
               list_slice(qs, (CAST(m AS INT) - 1) * {pq_sub} + 1,
                          CAST(m AS INT) * {pq_sub}) AS sv
        FROM q, unnest(generate_series(1, {pq_m})) AS t(m)
    ),
    csub AS (
        SELECT cid, CAST(m AS BIGINT) AS m,
               list_slice(cqs, (CAST(m AS INT) - 1) * {pq_sub} + 1,
                          CAST(m AS INT) * {pq_sub}) AS cv
        FROM cent, unnest(generate_series(1, {pq_m})) AS t(m)
    ),
    d AS (
        SELECT s.vec_id, s.m, c.cid,
               CAST(list_sum(list_transform(range(1, {pq_sub} + 1),
                   i -> (list_extract(s.sv, CAST(i AS INT))
                         - list_extract(c.cv, CAST(i AS INT)))
                        * (list_extract(s.sv, CAST(i AS INT))
                           - list_extract(c.cv, CAST(i AS INT)))))
                    AS BIGINT) AS dist
        FROM sub s JOIN csub c USING (m)
    ),
    best AS (
        SELECT vec_id, m,
               arg_min(cid, dist * 10000000 + cid) AS code,
               MIN(dist) AS min_dist
        FROM d GROUP BY vec_id, m
    )"""


_PQ_CTE_PREFIX = _pq_cte_prefix()


def _pq_centroid_arr(csub: DataFrame) -> DataFrame:
    """K-per-subspace long-form codebook → M rows of (m, cents) where
    `cents` is the cid-sorted array of (cid, cv) structs — the
    broadcastable shape the map-side argmin fold consumes (the
    clustering.py `_centroid_array` pattern, per subspace)."""
    return csub.groupBy("m").agg(
        F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("cents")
    )


def _pq_argmin(sv_col: str):
    """Map-side argmin over a broadcast `cents` array: exact integer
    subspace L2², strict `<` keeps the FIRST (lowest) cid on ties —
    identical to the oracle's min_by(cid, dist·1e7 + cid) because the
    array is cid-sorted. Returns struct(best BIGINT, cid BIGINT);
    `best` is the winning distance (== MIN(dist): the key is
    dist-major). Replaces the round-≤14 K-way join + (vec_id, m)
    groupBy, which materialized |corpus|·M·K rows and shuffled the
    subvectors — this form touches NO exchange (r15, guide §2.4)."""

    def step(acc, p):
        d = F.aggregate(
            F.zip_with(
                F.col(sv_col), p["cv"], lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        better = d < acc["best"]
        return F.struct(
            F.when(better, d).otherwise(acc["best"]).alias("best"),
            F.when(better, p["cid"]).otherwise(acc["cid"]).alias("cid"),
        )

    return F.aggregate(
        "cents",
        F.struct(
            F.lit(2**62).cast("bigint").alias("best"),
            F.lit(None).cast("bigint").alias("cid"),
        ),
        step,
    )


def _pq_lloyd(sub: DataFrame, csub: DataFrame, rounds: int) -> DataFrame:
    """Per-subspace integer Lloyd rounds over the PQ codebook: assign
    every subvector to its nearest centroid (exact integer L2², ties
    → lowest cid — the same min_by key as the code assignment), then
    move each centroid to the rounded member mean. The mean rounds
    through the +127 shift so the arithmetic is floor-division-
    portable (q_llm_kmeans's (2·Σu + n) DIV 2n discipline, DuckDB //
    == Spark DIV on non-negative operands), then shifts back to the
    signed grid — distances are shift-invariant, so both engines walk
    the identical trajectory.

    Scale shape per round: one broadcast of the ≤M·K-row codebook
    into the subvector stream, one codes-sized shuffle keyed
    (vec_id, m) for the argmin (partial min_by map-side), one
    M·K·SUB-bounded update shuffle — the q_llm_kmeans plan, once per
    subspace, all subspaces in the same jobs."""
    for _ in range(rounds):
        # Assignment is the map-side broadcast-array argmin fold
        # (_pq_argmin): no K-way join blowup, no (vec_id, m) shuffle
        # carrying the subvectors — the round-14 asg exchanged
        # |corpus|·M rows with their 8-int arrays every round (r15).
        asg = (
            sub.join(F.broadcast(_pq_centroid_arr(csub)), "m")
            .withColumn("acc", _pq_argmin("sv"))
            .select("vec_id", "m", "sv", F.col("acc.cid").alias("code"))
        )
        csub = (
            asg.select(
                "m",
                F.col("code").alias("cid"),
                F.posexplode("sv").alias("pos", "x"),
            )
            .groupBy("m", "cid", "pos")
            .agg(
                (
                    F.expr(
                        "CAST((2 * SUM(x + 127) + COUNT(*))"
                        " DIV (2 * COUNT(*)) AS BIGINT)"
                    )
                    - F.lit(127)
                ).alias("c")
            )
            .groupBy("cid", "m")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("cv")
            )
            # Lineage cap (the q_graph_kcore discipline): the ≤M·K-row
            # codebook is eagerly localCheckpoint-ed per round so a
            # cold one-shot caller pays `rounds` small jobs instead of
            # one nested DAG re-deriving every earlier round inside
            # each broadcast (BENCH_r09's 41 s cold max vs 5 s median).
            # Values untouched — the trajectory is the oracle's.
            .transform(materialize)
        )
    return csub


def _opq_perm_expr(col: str, pq_m: int, sub: int) -> str:
    """OPQ-lite fixed stride permutation (Spark SQL): new position p
    (0-based) takes old dim (p DIV sub) + (p MOD sub)·M + 1, so
    subspace m receives the strided dims {m+1, m+1+M, m+1+2M, …}
    instead of a contiguous block — the zero-training stand-in for
    OPQ's learned rotation (Ge et al. 2014): it decorrelates subspaces
    when adjacent dimensions co-vary. L2 is permutation-invariant, so
    the exact re-rank and the pq_exact_l2_topk ground truth are
    untouched. Deterministic and shared verbatim with the DuckDB
    oracle (list_extract mirror)."""
    d = pq_m * sub
    return (
        f"transform(sequence(0, {d - 1}), p -> element_at({col},"
        f" CAST(p DIV {sub} + (p % {sub}) * {pq_m} + 1 AS INT)))"
    )


def _pq_parts(
    emb: DataFrame,
    train_rounds: int = 0,
    pq_k: int | None = None,
    pq_m: int | None = None,
    opq: bool = False,
):
    """Spark-side PQ building blocks shared by q_llm_pq_codes,
    q_llm_ivfpq_topk and q_llm_pq_rerank: returns (q, sub, csub,
    best) — the int8-quantized vector relation, the subvector
    stream, the K·M-row codebook, and the per-(vector, subspace)
    argmin code relation. Mirrors _PQ_CTE_PREFIX stage for stage.
    `train_rounds` > 0 Lloyd-refines the id-selected codebook per
    subspace before codes are assigned (_pq_lloyd — the trained-
    codebook upgrade; q_llm_pq_train oracle-checks the trajectory,
    ANN_RECALL.md measures the recall lift). `pq_k` overrides the
    centroids-per-subspace dial (default _PQ_K=16; ANN_RECALL.md
    measures K=64 — a 6-bit code, still 8 code-bytes/vector).
    `pq_m` overrides the subspace count (default _PQ_M=8; M=16 gives
    4-dim subspaces and 16 code-bytes/vector — finer quantization at
    2× code storage). `opq` applies the fixed stride permutation
    (_opq_perm_expr) before the subspace split."""
    if pq_k is None:
        pq_k = _PQ_K
    if pq_m is None:
        pq_m = _PQ_M
    pq_sub = (_PQ_M * _PQ_SUB) // pq_m
    g = emb.agg(
        F.max(
            F.expr(
                "array_max(transform(embedding,"
                " x -> abs(cast(x as double))))"
            )
        ).alias("gscale")
    )
    q = (
        emb.crossJoin(F.broadcast(g))
        .filter(F.col("gscale") > 0)
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> cast(floor("
                "(cast(x as double) * 127) / gscale + 0.5) as bigint))"
            ).alias("qs"),
        )
    )
    if opq:
        q = q.select(
            "vec_id", F.expr(_opq_perm_expr("qs", pq_m, pq_sub)).alias("qs")
        )
    # Round-15 re-measure of the round-9 "don't cache q" decision: at
    # T+1 = 3 derivations, materializing lost (5.3 vs 3.7 s); but the
    # composite serving paths now derive q up to ~34 times per plan
    # (q_llm_ann_tuned's before-plan: 34 parquet scans, 32 broadcast
    # builds — plans/r15/q_llm_ann_tuned_before.txt), so ONE eager
    # materialization wins across the family: every consumer reads
    # the 65-int rows, and the A/B at sf0.1 preferred localCheckpoint
    # over persist() (ann_tuned ~6 vs ~7 s) because truncating the
    # lineage also removes the repeated gscale/quantize subtree from
    # every downstream plan's analysis and broadcast builds. Blocks
    # free on RDD GC (the _pq_lloyd / label-prop convention); on a
    # real cluster swap for a reliable checkpoint dir (executor-loss
    # recovery — operators/graph.py note). The RoundRobin repartition
    # is the semdedup single-file lesson — the map-side argmin fold
    # below must not inherit a one-partition parquet scan — and is
    # REPARTITION_BY_NUM, exempt from AQE byte-coalescing (the
    # SCALING.md §round-14 width rule; NOT a hash shuffle on vec_id).
    q = q.repartition(
        q.sparkSession.sparkContext.defaultParallelism
    ).transform(materialize)
    cent = (
        q.orderBy("vec_id")
        .limit(pq_k)
        .select(F.col("vec_id").alias("cid"), F.col("qs").alias("cqs"))
    )
    sub = q.select(
        "vec_id",
        F.explode(F.expr(f"sequence(1, {pq_m})")).alias("m"),
        "qs",
    ).select(
        "vec_id",
        F.col("m").cast("bigint").alias("m"),
        F.expr(f"slice(qs, (m - 1) * {pq_sub} + 1, {pq_sub})").alias("sv"),
    )
    csub = cent.select(
        "cid",
        F.explode(F.expr(f"sequence(1, {pq_m})")).alias("m"),
        "cqs",
    ).select(
        "cid",
        F.col("m").cast("bigint").alias("m"),
        F.expr(f"slice(cqs, (m - 1) * {pq_sub} + 1, {pq_sub})").alias("cv"),
    )
    if train_rounds:
        csub = _pq_lloyd(sub, csub, train_rounds)
    # Code assignment = the same map-side argmin fold as the Lloyd
    # rounds: `best` now costs ZERO exchanges (sub is a map-side
    # explode of the cached q; the codebook broadcasts as M array
    # rows) versus the round-≤14 |corpus|·M·K-row join + (vec_id, m)
    # min_by shuffle. acc.best IS min(dist) — the fold key is
    # dist-major — so distortion semantics are untouched (r15).
    best = (
        sub.join(F.broadcast(_pq_centroid_arr(csub)), "m")
        .withColumn("acc", _pq_argmin("sv"))
        .select(
            "vec_id",
            "m",
            F.col("acc.cid").alias("code"),
            F.col("acc.best").alias("min_dist"),
        )
    )
    return q, sub, csub, best


def pq_adc_topk(
    emb: DataFrame,
    n_probes: int = 10,
    k: int = 5,
    rerank_r: int | None = None,
    nprobe: int | None = None,
    train_rounds: int = 0,
    pq_k: int | None = None,
    pq_m: int | None = None,
    opq: bool = False,
) -> DataFrame:
    """Reusable PQ/ADC serving core (q_llm_ivfpq_topk, q_llm_pq_rerank,
    tools/ann_recall.py): top-k neighbors per probe (vec_id < n_probes)
    ranked by exact-integer ADC distance over the stored 8-int codes.

    With rerank_r set, runs FAISS-IVFPQ's standard second stage: the
    top-R candidates by ADC are re-scored with the EXACT integer L2
    over the full 64-int quantized vectors, and the final top-k ranks
    by (exact_dist, neighbor_id). The candidate relation entering the
    re-rank is ≤ R·|probes| rows by construction, so its joins
    broadcast the candidates and its final window is bounded — no
    salting needed past the ADC stage.

    Top-k discipline: the ADC top-R is two-stage — salted partial
    heaps per (probe, pmod(neighbor_id, 32)) bound every sort to
    |corpus|/32, then the final window ranks ≤ 32·R survivors.

    With nprobe set, IVF cluster pruning runs FIRST (the full FAISS
    IVFPQ recipe, q_llm_ivfpq_pruned): vectors IVF-assign to the
    nearest of the 16 centroids by full-vector integer L2 (broadcast
    pivot join + map-combined argmin, exchanged on vec_id — the same
    key as the code pivot, so candidates co-partition), each probe
    opens only its nprobe nearest clusters, and ADC scores only codes
    inside probed clusters — candidate fraction ~nprobe/16 on top of
    the 32× code compression.

    `train_rounds` > 0 Lloyd-refines the subspace codebooks before
    codes are assigned (_pq_lloyd) — the ADC distance table is built
    against the TRAINED centroids, everything downstream unchanged.
    `pq_m`/`opq` pass through to _pq_parts (subspace-count dial and
    the OPQ-lite stride permutation; the exact re-rank is
    permutation-invariant so only the ADC stage sees either)."""
    q, sub, csub, best = _pq_parts(
        emb, train_rounds=train_rounds, pq_k=pq_k, pq_m=pq_m, opq=opq
    )
    probes = sub.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), "m", F.col("sv").alias("pv")
    )
    l2 = (
        "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    dt = probes.join(F.broadcast(csub), "m").select(
        "probe_id",
        "m",
        "cid",
        F.expr(l2.format(a="pv", b="cv")).alias("pdist"),
    )
    if nprobe is None:
        adc_src = best.alias("b")
        dt_cond = (
            (F.col("b.m") == F.col("t.m"))
            & (F.col("b.code") == F.col("t.cid"))
            & (F.col("b.vec_id") != F.col("t.probe_id"))
        )
    else:
        piv = q.filter(F.col("vec_id") < _PQ_K).select(
            F.col("vec_id").alias("pid"), F.col("qs").alias("pqs")
        )
        # IVF assignment via the same broadcast-array argmin fold as
        # the code assignment: one projection over the cached q — the
        # round-≤14 form crossJoined all 16 pivots into the corpus and
        # shuffled |corpus|·16 rows through a groupBy argmin (the
        # "fixed cost" the round-15 baseline addendum priced at
        # +2.6 s sf0.1). Tie order (lowest pid) is preserved by the
        # pid-sorted array + strict `<` (r15).
        piv_arr = piv.agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("pid").alias("cid"), F.col("pqs").alias("cv")
                    )
                )
            ).alias("cents")
        )
        assign = (
            q.crossJoin(F.broadcast(piv_arr))
            .withColumn("acc", _pq_argmin("qs"))
            .select("vec_id", F.col("acc.cid").alias("cluster"))
        )
        wc = Window.partitionBy("probe_id").orderBy("cdist", "pid")
        probecl = (
            q.filter(F.col("vec_id") < n_probes)
            .select(
                F.col("vec_id").alias("probe_id"), F.col("qs").alias("prqs")
            )
            .crossJoin(F.broadcast(piv))
            .select(
                "probe_id",
                "pid",
                F.expr(l2.format(a="prqs", b="pqs")).alias("cdist"),
            )
            .withColumn("crk", F.row_number().over(wc))
            .filter(F.col("crk") <= nprobe)
            .select("probe_id", F.col("pid").alias("cluster"))
        )
        adc_src = (
            best.join(assign, "vec_id")
            .join(F.broadcast(probecl), "cluster")
            .alias("b")
        )
        dt_cond = (
            (F.col("b.m") == F.col("t.m"))
            & (F.col("b.code") == F.col("t.cid"))
            & (F.col("b.probe_id") == F.col("t.probe_id"))
            & (F.col("b.vec_id") != F.col("t.probe_id"))
        )
    adc = (
        adc_src.join(F.broadcast(dt).alias("t"), dt_cond)
        .groupBy(
            F.col("t.probe_id").alias("probe_id"),
            F.col("b.vec_id").alias("neighbor_id"),
        )
        .agg(F.sum("pdist").cast("bigint").alias("adc_dist"))
    )
    r = k if rerank_r is None else rerank_r
    cand = _salted_topk(adc, "adc_dist", r).select(
        "probe_id", "neighbor_id", "adc_dist", "rnk"
    )
    if rerank_r is None:
        return cand
    # Exact re-rank: candidates broadcast into the quantized-vector
    # relation (never the reverse — q is corpus-sized), full-vector
    # integer L2, final rank over ≤ R rows per probe.
    qn = q.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qs").alias("nqs")
    )
    qp = q.select(F.col("vec_id").alias("probe_id"), F.col("qs").alias("pqs"))
    ex = (
        qn.join(F.broadcast(cand.drop("rnk")), "neighbor_id")
        .join(F.broadcast(qp.filter(F.col("probe_id") < n_probes)), "probe_id")
        .select(
            "probe_id",
            "neighbor_id",
            "adc_dist",
            F.expr(
                "aggregate(zip_with(pqs, nqs, (a, b) -> (a - b) * (a - b)),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("exact_dist"),
        )
    )
    wr = Window.partitionBy("probe_id").orderBy("exact_dist", "neighbor_id")
    return ex.select(
        "probe_id",
        "neighbor_id",
        "adc_dist",
        "exact_dist",
        F.row_number().over(wr).cast("bigint").alias("rnk"),
    ).filter(F.col("rnk") <= k)


def _salted_topk(scored: DataFrame, dist_col: str, r: int) -> DataFrame:
    """Salted two-stage deterministic top-r per probe_id over a
    corpus-sized candidate relation: partial top-r per (probe,
    pmod(neighbor_id, 32)) bounds every sort to |candidates|/32, the
    final probe-keyed window ranks ≤ 32·r survivors. Exactly equal to
    a single global window (both stages share the (dist, neighbor_id)
    total order) — the round-9 replacement for the per-probe
    full-sort scale-killer. Output adds bigint `rnk` ≤ r."""
    wpart = Window.partitionBy("probe_id", "salt").orderBy(
        dist_col, "neighbor_id"
    )
    w = Window.partitionBy("probe_id").orderBy(dist_col, "neighbor_id")
    return (
        scored.withColumn("salt", F.pmod(F.col("neighbor_id"), F.lit(32)))
        .withColumn("prnk", F.row_number().over(wpart))
        .filter(F.col("prnk") <= r)
        .drop("salt", "prnk")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= r)
    )


def pq_exact_l2_topk(emb: DataFrame, n_probes: int = 10, k: int = 5) -> DataFrame:
    """Exact integer-L2 top-k over the full quantized vectors — the
    ground truth tools/ann_recall.py scores the PQ/ADC path against
    (same metric, same int8 grid, no subspace quantization), isolating
    the codebook approximation error from the metric choice."""
    q, _sub, _csub, _best = _pq_parts(emb)
    p = q.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), F.col("qs").alias("pqs")
    )
    scored = (
        q.join(F.broadcast(p), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(pqs, qs, (a, b) -> (a - b) * (a - b)),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("exact_dist"),
        )
    )
    wpart = Window.partitionBy("probe_id", "salt").orderBy(
        "exact_dist", "neighbor_id"
    )
    w = Window.partitionBy("probe_id").orderBy("exact_dist", "neighbor_id")
    return (
        scored.withColumn("salt", F.pmod(F.col("neighbor_id"), F.lit(32)))
        .withColumn("prnk", F.row_number().over(wpart))
        .filter(F.col("prnk") <= k)
        .drop("salt", "prnk")
        .select(
            "probe_id",
            "neighbor_id",
            "exact_dist",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


@register(
    "q_llm_pq_codes",
    oracle=f"""
    WITH {_PQ_CTE_PREFIX}
    SELECT vec_id,
           {{codes}},
           CAST(SUM(min_dist) AS BIGINT) AS distortion
    FROM best GROUP BY vec_id
    """.format(
        codes=",\n           ".join(
            f"CAST(MAX(CASE WHEN m = {m} THEN code END) AS BIGINT)"
            f" AS code_{m}"
            for m in range(1, _PQ_M + 1)
        ),
    ),
)
def q_llm_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: each 64-dim embedding compresses to 8
    codebook indices (one per 8-dim subspace, 16 centroids each) plus
    its total integer distortion — the memory layout ANN systems like
    FAISS-IVFPQ serve from (64 floats → 8 codes ≈ 32× compression).

    Determinism engineering: distances compare EXACT INTEGERS because
    vectors are first int8-quantized with a single global scale (the
    q_llm_embed_quantize floor(x·127/scale + 0.5) discipline — float
    multiply/divide is the identical IEEE expression on both engines,
    and everything after is integer); a float L2 argmin would be
    engine-ordering-fragile in the last ulp. Centroids are the K=16
    smallest vec_ids — deterministic AND oracle-expressible (the
    hashed-pivot family used by IVF needs Spark's seeded xxhash64,
    which DuckDB cannot evaluate); ties in the argmin break on the
    composite dist·1e7 + cid, exact in int64.

    Scale: the codebook is 16 rows — broadcast; the subspace explode
    is 8× map-side; the per-(vector, subspace) argmin is a groupBy
    over broadcast-join output that never shuffles the corpus (codes
    pivot back with one exchange on vec_id). At 100 TB: scan-bound,
    one narrow shuffle of 9 integers per vector."""
    _q, sub, csub, best = _pq_parts(load_embeddings(spark, sf_dir))
    code_cols = [
        F.max(F.when(F.col("m") == m, F.col("code")))
        .cast("bigint")
        .alias(f"code_{m}")
        for m in range(1, _PQ_M + 1)
    ]
    return best.groupBy("vec_id").agg(
        *code_cols, F.sum("min_dist").cast("bigint").alias("distortion")
    )


@register(
    "q_llm_ivfpq_topk",
    oracle=f"""
    WITH {_PQ_CTE_PREFIX},
    probes AS (
        SELECT vec_id AS probe_id, m, sv AS pv
        FROM sub WHERE vec_id < 10
    ),
    dt AS (
        SELECT p.probe_id, p.m, c.cid,
               CAST(list_sum(list_transform(range(1, {_PQ_SUB} + 1),
                   i -> (list_extract(p.pv, CAST(i AS INT))
                         - list_extract(c.cv, CAST(i AS INT)))
                        * (list_extract(p.pv, CAST(i AS INT))
                           - list_extract(c.cv, CAST(i AS INT)))))
                    AS BIGINT) AS pdist
        FROM probes p JOIN csub c USING (m)
    ),
    adc AS (
        SELECT t.probe_id, b.vec_id AS neighbor_id,
               CAST(SUM(t.pdist) AS BIGINT) AS adc_dist
        FROM best b JOIN dt t ON b.m = t.m AND b.code = t.cid
        WHERE b.vec_id <> t.probe_id
        GROUP BY 1, 2
    )
    SELECT probe_id, neighbor_id, adc_dist,
           CAST(row_number() OVER (
               PARTITION BY probe_id
               ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rnk
    FROM adc
    QUALIFY rnk <= 5
    """,
)
def q_llm_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving from PQ codes — asymmetric distance computation
    (ADC): each probe precomputes a 8×16 integer distance table
    against the codebook, and every corpus vector's distance is then
    just 8 table lookups summed over its stored codes — the corpus
    EMBEDDINGS are never touched at query time, only the 8-int codes.
    This is FAISS-IVFPQ's query path, relationally expressed; top-5
    per probe (vec_id < 10, the q_llm_cosine_topk probe convention),
    ranked by exact-integer ADC distance with neighbor_id tie-break.

    Plan: the distance table (10 probes × 128 entries) broadcasts; the
    code relation streams through one broadcast join and reduces
    map-side to (probe, vector) partial sums, so the only wide
    exchange carries 3 integers per candidate. In a real deployment
    the codes table is precomputed once (q_llm_pq_codes) and this
    query's cost is INDEPENDENT of embedding dimension — the 32×
    bandwidth win that makes 100 TB vector serving feasible; the
    rank-vs-exact quality of this operating point is measured in
    ANN_RECALL.md (PQ/ADC rows; exact re-rank in q_llm_pq_rerank).

    Top-k discipline (round-9 fix): with few probes, a single
    row_number window PARTITION BY probe_id sorts the ENTIRE corpus
    candidate set in one task per probe — the r8 plan did exactly
    that and was flagged as the round's one scale-killer. Now
    two-stage: partial top-5 per (probe, pmod(neighbor_id, 32))
    salt bucket — 32-way parallel, each partition ≤ |corpus|/32 —
    then final top-5 over the ≤ 160 salted survivors. Deterministic
    (the salt is a pure function of neighbor_id, both stages order by
    (adc_dist, neighbor_id)) and exactly equal to the global top-5,
    so the oracle's single QUALIFY stays the correctness twin.
    tests/test_plans.py pins the two-window shape."""
    return pq_adc_topk(load_embeddings(spark, sf_dir), n_probes=10, k=5)


@register(
    "q_llm_pq_rerank",
    oracle=f"""
    WITH {_PQ_CTE_PREFIX},
    probes AS (
        SELECT vec_id AS probe_id, m, sv AS pv
        FROM sub WHERE vec_id < 10
    ),
    dt AS (
        SELECT p.probe_id, p.m, c.cid,
               CAST(list_sum(list_transform(range(1, {_PQ_SUB} + 1),
                   i -> (list_extract(p.pv, CAST(i AS INT))
                         - list_extract(c.cv, CAST(i AS INT)))
                        * (list_extract(p.pv, CAST(i AS INT))
                           - list_extract(c.cv, CAST(i AS INT)))))
                    AS BIGINT) AS pdist
        FROM probes p JOIN csub c USING (m)
    ),
    adc AS (
        SELECT t.probe_id, b.vec_id AS neighbor_id,
               CAST(SUM(t.pdist) AS BIGINT) AS adc_dist
        FROM best b JOIN dt t ON b.m = t.m AND b.code = t.cid
        WHERE b.vec_id <> t.probe_id
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT probe_id, neighbor_id, adc_dist,
               row_number() OVER (
                   PARTITION BY probe_id
                   ORDER BY adc_dist, neighbor_id) AS arnk
        FROM adc
        QUALIFY arnk <= 20
    ),
    ex AS (
        SELECT c.probe_id, c.neighbor_id, c.adc_dist,
               CAST(list_sum(list_transform(
                   range(1, {_PQ_M * _PQ_SUB} + 1),
                   i -> (list_extract(qp.qs, CAST(i AS INT))
                         - list_extract(qn.qs, CAST(i AS INT)))
                        * (list_extract(qp.qs, CAST(i AS INT))
                           - list_extract(qn.qs, CAST(i AS INT)))))
                    AS BIGINT) AS exact_dist
        FROM cand c
        JOIN q qp ON qp.vec_id = c.probe_id
        JOIN q qn ON qn.vec_id = c.neighbor_id
    )
    SELECT probe_id, neighbor_id, adc_dist, exact_dist,
           CAST(row_number() OVER (
               PARTITION BY probe_id
               ORDER BY exact_dist, neighbor_id) AS BIGINT) AS rnk
    FROM ex
    QUALIFY rnk <= 5
    """,
)
def q_llm_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS-IVFPQ's standard second stage: ADC candidate generation
    (top-20 per probe by table-lookup distance over the 8-int codes)
    followed by an EXACT integer-L2 re-rank of those 20 candidates
    against the full 64-int quantized vectors, final top-5 per probe
    by (exact_dist, neighbor_id). The re-rank recovers most of what
    subspace quantization loses — measured in ANN_RECALL.md's PQ
    section (ADC-only vs ADC+rerank recall against the exact-L2
    ground truth, tools/ann_recall.py).

    Scale: the ADC stage is the q_llm_ivfpq_topk plan (codes stream
    through one broadcast join, salted two-stage top-R); the re-rank
    touches full vectors for ONLY R·|probes| candidates — the
    candidates broadcast into the corpus-side quantized relation, the
    corpus itself is never re-shuffled, and the final window ranks a
    bounded ≤ 20-row partition per probe. This is the 100 TB serving
    recipe: dimension-independent scan for candidates, full-precision
    arithmetic only on the shortlist."""
    return pq_adc_topk(load_embeddings(spark, sf_dir), n_probes=10, k=5, rerank_r=20)


_PQ_FULL_L2 = (
    "CAST(list_sum(list_transform(range(1, {dim} + 1),"
    " i -> (list_extract({a}, CAST(i AS INT))"
    " - list_extract({b}, CAST(i AS INT)))"
    " * (list_extract({a}, CAST(i AS INT))"
    " - list_extract({b}, CAST(i AS INT))))) AS BIGINT)"
)


@register(
    "q_llm_ivfpq_pruned",
    oracle=f"""
    WITH {_PQ_CTE_PREFIX},
    piv AS (SELECT vec_id AS pid, qs AS pqs FROM q WHERE vec_id < 16),
    assign AS (
        SELECT q.vec_id,
               arg_min(p.pid,
                   {_PQ_FULL_L2.format(dim=_PQ_M * _PQ_SUB, a="q.qs", b="p.pqs")}
                   * 10000000 + p.pid) AS cluster
        FROM q CROSS JOIN piv p GROUP BY q.vec_id
    ),
    probecl AS (
        SELECT pr.vec_id AS probe_id, p.pid AS cluster,
               row_number() OVER (PARTITION BY pr.vec_id
                   ORDER BY
                   {_PQ_FULL_L2.format(dim=_PQ_M * _PQ_SUB, a="pr.qs", b="p.pqs")},
                   p.pid) AS crk
        FROM q pr CROSS JOIN piv p WHERE pr.vec_id < 10
        QUALIFY crk <= 4
    ),
    probes AS (
        SELECT vec_id AS probe_id, m, sv AS pv FROM sub WHERE vec_id < 10
    ),
    dt AS (
        SELECT p.probe_id, p.m, c.cid,
               {_PQ_FULL_L2.format(dim=_PQ_SUB, a="p.pv", b="c.cv")} AS pdist
        FROM probes p JOIN csub c USING (m)
    ),
    adc AS (
        SELECT t.probe_id, b.vec_id AS neighbor_id,
               CAST(SUM(t.pdist) AS BIGINT) AS adc_dist
        FROM best b
        JOIN assign a ON a.vec_id = b.vec_id
        JOIN probecl pc ON pc.cluster = a.cluster
        JOIN dt t ON b.m = t.m AND b.code = t.cid
                 AND t.probe_id = pc.probe_id
        WHERE b.vec_id <> t.probe_id
        GROUP BY 1, 2
    )
    SELECT probe_id, neighbor_id, adc_dist,
           CAST(row_number() OVER (PARTITION BY probe_id
               ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rnk
    FROM adc QUALIFY rnk <= 5
    """,
)
def q_llm_ivfpq_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL IVFPQ serving — IVF cluster pruning composed with PQ/ADC
    scoring, the complete FAISS recipe: vectors are IVF-assigned to
    the nearest of 16 centroids (full-vector integer L2, the 16
    lowest vec_ids as the deterministic oracle-expressible codebook),
    each probe ranks the centroids and opens only nprobe=4 clusters,
    and ADC table-lookup distances are computed ONLY for codes inside
    probed clusters. This closes the gap q_llm_ivfpq_topk documents:
    its exhaustive ADC scan has candidate fraction 1.0 (bandwidth win
    only); here the scan shrinks to ~nprobe/16 = 25% of the corpus
    BEFORE any distance work, multiplying with the 32× code
    compression.

    Scale plan: cluster assignment is a broadcast (16-row pivot) join
    + map-combined integer argmin, exchanged once on vec_id — the
    SAME key as the PQ code pivot, so `best ⋈ assign` co-partitions
    without a new shuffle shape; the probe→cluster list (40 rows) and
    the 10×128 distance table broadcast; the per-probe centroid
    ranking window is bounded by the 16-pivot fan-out. Final top-5 is
    the salted two-stage _salted_topk. Ties in assignment break on
    the exact-integer dist·1e7 + pid composite (dist ≤ 64·254² < 1e7,
    so the encoding is collision-free)."""
    return pq_adc_topk(load_embeddings(spark, sf_dir), n_probes=10, k=5, nprobe=4)


def _pq_train_round_cte(prev: str, tag: str) -> str:
    """One oracle Lloyd step per subspace: assignment vs `prev`
    (integer L2² over the shifted grid, ties → lowest cid), then the
    rounded-mean update — mirrors _pq_lloyd stage for stage. The
    oracle works entirely on the +127-shifted grid (distances are
    shift-invariant; the Spark side shifts inside the mean only) so
    every `//` sees non-negative operands."""
    return f"""
    a{tag} AS (
        SELECT s.vec_id, s.m, c.cid,
               SUM((s.u - c.c) * (s.u - c.c)) AS dist
        FROM subl s JOIN {prev} c ON s.m = c.m AND s.dim = c.dim
        GROUP BY s.vec_id, s.m, c.cid
    ),
    asg{tag} AS (
        SELECT vec_id, m, cid, dist FROM a{tag}
        QUALIFY row_number() OVER (PARTITION BY vec_id, m
                                   ORDER BY dist, cid) = 1
    ),
    c{tag} AS (
        SELECT a.cid, s.m, s.dim,
               (2 * SUM(s.u) + COUNT(*)) // (2 * COUNT(*)) AS c
        FROM asg{tag} a JOIN subl s
             ON a.vec_id = s.vec_id AND a.m = s.m
        GROUP BY a.cid, s.m, s.dim
    )"""


@register(
    "q_llm_pq_train",
    oracle=f"""
    WITH {_PQ_CTE_PREFIX},
    subl AS (
        SELECT vec_id, m, CAST(d AS BIGINT) AS dim,
               sv[CAST(d AS INT)] + 127 AS u
        FROM sub, unnest(generate_series(1, {_PQ_SUB})) AS t(d)
    ),
    c0 AS (
        SELECT cid, m, CAST(d AS BIGINT) AS dim,
               cv[CAST(d AS INT)] + 127 AS c
        FROM csub, unnest(generate_series(1, {_PQ_SUB})) AS t(d)
    ),
    {_pq_train_round_cte('c0', '1')},
    {_pq_train_round_cte('c1', '2')},
    af AS (
        SELECT s.vec_id, s.m, c.cid,
               SUM((s.u - c.c) * (s.u - c.c)) AS dist
        FROM subl s JOIN c2 c ON s.m = c.m AND s.dim = c.dim
        GROUP BY s.vec_id, s.m, c.cid
    ),
    asgf AS (
        SELECT vec_id, m, cid, dist FROM af
        QUALIFY row_number() OVER (PARTITION BY vec_id, m
                                   ORDER BY dist, cid) = 1
    )
    SELECT m AS subspace, cid AS cluster_id,
           COUNT(*) AS n_members,
           CAST(SUM(dist) AS BIGINT) AS inertia
    FROM asgf GROUP BY m, cid ORDER BY subspace, cluster_id
    """,
)
def q_llm_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook TRAINING: two integer Lloyd rounds per subspace
    from the id-selected seeds (the FAISS `train()` step the rest of
    the PQ family documents as its production upgrade), reporting per
    (subspace, centroid) the member count and exact-integer inertia
    of the final assignment. ANN_RECALL.md measures what this buys at
    serving time (pq_adc_topk(train_rounds=2)); THIS query pins that
    the training trajectory itself is bit-identical across engines —
    assignment by exact integer L2² with lowest-cid tie-break, means
    rounded via the shift-portable (2·Σu + n) DIV 2n.

    Plan (pinned): per round the ≤M·K-row codebook broadcasts into
    the subvector stream, the argmin shuffles codes-sized rows keyed
    (vec_id, m) with map-side partial min_by, and the update shuffle
    is bounded by M·K·SUB cells — the q_llm_kmeans shape run for all
    8 subspaces in the same jobs. At 100 TB: 3 scans of the 8-int
    subvector stream, no vector ever leaves its executor unreduced."""
    _q, _sub, _csub, best = _pq_parts(
        load_embeddings(spark, sf_dir), train_rounds=2
    )
    return (
        best.groupBy(
            F.col("m").alias("subspace"), F.col("code").alias("cluster_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("min_dist").cast("bigint").alias("inertia"),
        )
        .orderBy("subspace", "cluster_id")
    )


@register(
    "q_llm_bigram_ppl",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
        FROM toks
    ),
    dbg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM dbg GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY w1),
    v AS (
        SELECT COUNT(DISTINCT tok) AS v FROM (
            SELECT unnest(t) AS tok FROM toks
        )
    ),
    scored AS (
        SELECT d.doc_id,
               CAST(floor(-ln((c12.c12 + 1.0) / (c1.c1 + v.v)) * 1000000
                          + 0.5) AS BIGINT) AS nll_e6
        FROM dbg d
        JOIN c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
        JOIN c1 ON d.w1 = c1.w1
        CROSS JOIN v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(nll_e6) // COUNT(*) AS BIGINT) AS avg_nll_e6
    FROM scored GROUP BY doc_id
    ORDER BY avg_nll_e6 DESC, doc_id LIMIT 20
    """,
)
def q_llm_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-quality scoring: per-document average bigram surprisal under
    the corpus's own add-one-smoothed bigram model — the 20 most
    surprising (≈ highest-perplexity) documents, the classic
    train-a-cheap-LM-and-filter-the-tail signal (CCNet's perplexity
    gate with the n-gram model standing in for KenLM).

    Float discipline: a per-doc SUM of ln-probabilities is
    order-dependent in float — instead each bigram's surprisal is
    fixed to an INTEGER at e6 scale (floor(−ln p · 1e6 + ½)) and the
    document aggregates exact integers, so partition order cannot
    move the result and the DIV average is engine-exact. The only
    float is the single per-distinct-bigram ln, rounded at the same
    width the BM25/tfidf family already pins (SURVEY §7.4).

    Plan: bigrams explode map-side; the count tables aggregate
    map-combined on (w1, w2) then w1; vocabulary is a 1-row broadcast
    attach; the doc stream joins counts keyed on the SAME (w1, w2)
    the counting shuffle produced, re-keys once on w1, and the final
    per-doc sum shuffles (doc_id, int) pairs. Top-20 is
    TakeOrderedAndProject. Words move; text never does."""
    # fan_out(documents) was tried here (r16) and measured SLOWER
    # (paired 1.8/1.8 → 2.5/2.5 s): the split+explode per-row work is
    # light and the counting groupBy re-exchanges immediately anyway,
    # so the widening shuffle + lost scan fusion is a net cost. The
    # fan_out wins stay with the md5-heavy map stages (permutation,
    # quantile sketch, ngram novelty).
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 2)
    dbg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1,"
                "             element_at(toks, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c12 = dbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = toks.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    scored = (
        dbg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.expr(
                "CAST(floor(-ln((c12 + 1.0) / (c1 + v)) * 1000000 + 0.5)"
                " AS BIGINT)"
            ).alias("nll_e6"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("CAST(SUM(nll_e6) DIV COUNT(*) AS BIGINT)").alias(
                "avg_nll_e6"
            ),
        )
        .orderBy(F.desc("avg_nll_e6"), "doc_id")
        .limit(20)
    )


@register(
    "q_llm_pq_trained_topk",
    oracle=f"""
    WITH {_PQ_CTE_PREFIX},
    subl AS (
        SELECT vec_id, m, CAST(d AS BIGINT) AS dim,
               sv[CAST(d AS INT)] + 127 AS u
        FROM sub, unnest(generate_series(1, {_PQ_SUB})) AS t(d)
    ),
    c0 AS (
        SELECT cid, m, CAST(d AS BIGINT) AS dim,
               cv[CAST(d AS INT)] + 127 AS c
        FROM csub, unnest(generate_series(1, {_PQ_SUB})) AS t(d)
    ),
    {_pq_train_round_cte('c0', '1')},
    {_pq_train_round_cte('c1', '2')},
    csub2 AS (
        SELECT cid, m, list(c - 127 ORDER BY dim) AS cv
        FROM c2 GROUP BY cid, m
    ),
    d2 AS (
        SELECT s.vec_id, s.m, c.cid,
               CAST(list_sum(list_transform(range(1, {_PQ_SUB} + 1),
                   i -> (list_extract(s.sv, CAST(i AS INT))
                         - list_extract(c.cv, CAST(i AS INT)))
                        * (list_extract(s.sv, CAST(i AS INT))
                           - list_extract(c.cv, CAST(i AS INT)))))
                    AS BIGINT) AS dist
        FROM sub s JOIN csub2 c USING (m)
    ),
    best2 AS (
        SELECT vec_id, m,
               arg_min(cid, dist * 10000000 + cid) AS code,
               MIN(dist) AS min_dist
        FROM d2 GROUP BY vec_id, m
    ),
    probes AS (
        SELECT vec_id AS probe_id, m, sv AS pv
        FROM sub WHERE vec_id < 10
    ),
    dt AS (
        SELECT p.probe_id, p.m, c.cid,
               CAST(list_sum(list_transform(range(1, {_PQ_SUB} + 1),
                   i -> (list_extract(p.pv, CAST(i AS INT))
                         - list_extract(c.cv, CAST(i AS INT)))
                        * (list_extract(p.pv, CAST(i AS INT))
                           - list_extract(c.cv, CAST(i AS INT)))))
                    AS BIGINT) AS pdist
        FROM probes p JOIN csub2 c USING (m)
    ),
    adc AS (
        SELECT t.probe_id, b.vec_id AS neighbor_id,
               CAST(SUM(t.pdist) AS BIGINT) AS adc_dist
        FROM best2 b JOIN dt t ON b.m = t.m AND b.code = t.cid
        WHERE b.vec_id <> t.probe_id
        GROUP BY 1, 2
    )
    SELECT probe_id, neighbor_id, adc_dist,
           CAST(row_number() OVER (
               PARTITION BY probe_id
               ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rnk
    FROM adc
    QUALIFY rnk <= 5
    """,
)
def q_llm_pq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END trained-codebook ADC serving: the full
    train-then-serve PQ loop — two integer Lloyd rounds per subspace
    (q_llm_pq_train's trajectory), codes re-assigned against the
    TRAINED codebook, ADC top-5 per probe — oracle-checked as one
    query, so the handoff from training to serving (codebook layout,
    code re-assignment, distance-table build) is exact across
    engines, not just recall-measured (ANN_RECALL.md rows show the
    lift: codes-only recall 0.18 → 0.28 at sf0.01). This keeps the
    CHEAP default dials (K=16, codes only) as the end-to-end
    correctness certificate; the measured ≥0.5-recall operating point
    ships as q_llm_ann_tuned (K=64, T=2, exact re-rank R=100).

    Plan: identical to q_llm_ivfpq_topk's pinned shape downstream of
    the codebook (broadcast ADC table, codes-only streaming, salted
    two-stage top-k) with the training rounds prepended — the
    codebook stays ≤ M·K rows throughout, so training adds
    broadcast-join rounds plus codes-sized argmin shuffles keyed
    (vec_id, m), never a new wide shape (see q_llm_pq_train's pin)."""
    return pq_adc_topk(
        load_embeddings(spark, sf_dir), n_probes=10, k=5, train_rounds=2
    )


# The shipped operating point — re-tuned in round 12 from the measured
# dial sweep (ANN_RECALL.md): R=400 lifts recall@5 from 0.610 to
# 0.848 @ sf1.0 (0.984 @ sf0.1) at UNCHANGED code storage and ADC
# cost — the re-rank touches only R·|probes| full vectors, the
# cheapest ≥0.75 rung. The next rung is M=16 (0.894 @ R=100,
# 0.952 @ R=200) at 2× code bytes and 2× ADC adds; OPQ-lite and T≥3
# both measured neutral on this isotropic worst-case geometry (OPQ
# decorrelates subspaces only when adjacent dims co-vary; Lloyd
# plateaus by T=2) — both stay available as dials.
_ANN_TUNED_K = 64  # centroids/subspace (6-bit codes)
_ANN_TUNED_T = 2  # Lloyd training rounds per subspace
_ANN_TUNED_R = 400  # ADC candidates re-ranked exactly per probe
_ANN_TUNED_M = 16  # subspaces (code bytes/vector) — r13 re-baseline
_ANN_TUNED_OPQ = False  # OPQ-lite stride permutation before split
_ANN_TUNED_NPROBE = 8  # IVF cells opened of 16 — r15 re-baseline


def _ann_tuned_oracle(
    pq_k: int = _ANN_TUNED_K,
    pq_m: int = _ANN_TUNED_M,
    t_rounds: int = _ANN_TUNED_T,
    rerank_r: int = _ANN_TUNED_R,
    opq: bool = _ANN_TUNED_OPQ,
    nprobe: int | None = _ANN_TUNED_NPROBE,
) -> str:
    """The q_llm_ann_tuned oracle at ANY (K, M, T, R, OPQ, nprobe)
    operating point: _pq_cte_prefix at (K, M, OPQ), a chain of T
    Lloyd-round CTEs (each mirroring _pq_lloyd bit for bit), optional
    IVF cluster pruning (the q_llm_ivfpq_pruned CTEs at any nprobe —
    16 pivot centroids, full-quantized-vector argmin assignment,
    per-probe top-nprobe cells), ADC over the trained codebook, top-R
    shortlist, exact full-vector re-rank, top-5."""
    d = _PQ_M * _PQ_SUB
    pq_sub = d // pq_m
    train = ",\n    ".join(
        _pq_train_round_cte(f"c{i}", str(i + 1)) for i in range(t_rounds)
    )
    full_l2_d = _PQ_FULL_L2.format(dim=d, a="{a}", b="{b}")
    ivf_ctes = (
        ""
        if nprobe is None
        else f"""piv AS (SELECT vec_id AS pid, qs AS pqs FROM q WHERE vec_id < 16),
    assign AS (
        SELECT q.vec_id,
               arg_min(p.pid,
                   {full_l2_d.format(a="q.qs", b="p.pqs")}
                   * 10000000 + p.pid) AS cluster
        FROM q CROSS JOIN piv p GROUP BY q.vec_id
    ),
    probecl AS (
        SELECT pr.vec_id AS probe_id, p.pid AS cluster,
               row_number() OVER (PARTITION BY pr.vec_id
                   ORDER BY
                   {full_l2_d.format(a="pr.qs", b="p.pqs")},
                   p.pid) AS crk
        FROM q pr CROSS JOIN piv p WHERE pr.vec_id < 10
        QUALIFY crk <= {nprobe}
    ),
    """
    )
    ivf_joins = (
        ""
        if nprobe is None
        else """JOIN assign a ON a.vec_id = b.vec_id
        JOIN probecl pc ON pc.cluster = a.cluster
                       AND pc.probe_id = t.probe_id
        """
    )  # placed after the dt join so `t` is in scope
    return f"""
    WITH {_pq_cte_prefix(pq_k, pq_m, opq)},
    subl AS (
        SELECT vec_id, m, CAST(d AS BIGINT) AS dim,
               sv[CAST(d AS INT)] + 127 AS u
        FROM sub, unnest(generate_series(1, {pq_sub})) AS t(d)
    ),
    c0 AS (
        SELECT cid, m, CAST(d AS BIGINT) AS dim,
               cv[CAST(d AS INT)] + 127 AS c
        FROM csub, unnest(generate_series(1, {pq_sub})) AS t(d)
    ),
    {train},
    csubf AS (
        SELECT cid, m, list(c - 127 ORDER BY dim) AS cv
        FROM c{t_rounds} GROUP BY cid, m
    ),
    {ivf_ctes}d2 AS (
        SELECT s.vec_id, s.m, c.cid,
               CAST(list_sum(list_transform(range(1, {pq_sub} + 1),
                   i -> (list_extract(s.sv, CAST(i AS INT))
                         - list_extract(c.cv, CAST(i AS INT)))
                        * (list_extract(s.sv, CAST(i AS INT))
                           - list_extract(c.cv, CAST(i AS INT)))))
                    AS BIGINT) AS dist
        FROM sub s JOIN csubf c USING (m)
    ),
    best2 AS (
        SELECT vec_id, m,
               arg_min(cid, dist * 10000000 + cid) AS code
        FROM d2 GROUP BY vec_id, m
    ),
    probes AS (
        SELECT vec_id AS probe_id, m, sv AS pv
        FROM sub WHERE vec_id < 10
    ),
    dt AS (
        SELECT p.probe_id, p.m, c.cid,
               CAST(list_sum(list_transform(range(1, {pq_sub} + 1),
                   i -> (list_extract(p.pv, CAST(i AS INT))
                         - list_extract(c.cv, CAST(i AS INT)))
                        * (list_extract(p.pv, CAST(i AS INT))
                           - list_extract(c.cv, CAST(i AS INT)))))
                    AS BIGINT) AS pdist
        FROM probes p JOIN csubf c USING (m)
    ),
    adc AS (
        SELECT t.probe_id, b.vec_id AS neighbor_id,
               CAST(SUM(t.pdist) AS BIGINT) AS adc_dist
        FROM best2 b
        JOIN dt t ON b.m = t.m AND b.code = t.cid
        {ivf_joins}WHERE b.vec_id <> t.probe_id
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT probe_id, neighbor_id, adc_dist,
               row_number() OVER (
                   PARTITION BY probe_id
                   ORDER BY adc_dist, neighbor_id) AS arnk
        FROM adc
        QUALIFY arnk <= {rerank_r}
    ),
    ex AS (
        SELECT c.probe_id, c.neighbor_id, c.adc_dist,
               CAST(list_sum(list_transform(
                   range(1, {d} + 1),
                   i -> (list_extract(qp.qs, CAST(i AS INT))
                         - list_extract(qn.qs, CAST(i AS INT)))
                        * (list_extract(qp.qs, CAST(i AS INT))
                           - list_extract(qn.qs, CAST(i AS INT)))))
                    AS BIGINT) AS exact_dist
        FROM cand c
        JOIN q qp ON qp.vec_id = c.probe_id
        JOIN q qn ON qn.vec_id = c.neighbor_id
    )
    SELECT probe_id, neighbor_id, adc_dist, exact_dist,
           CAST(row_number() OVER (
               PARTITION BY probe_id
               ORDER BY exact_dist, neighbor_id) AS BIGINT) AS rnk
    FROM ex
    QUALIFY rnk <= 5
    """


@register(
    "q_llm_ann_tuned",
    oracle=_ann_tuned_oracle(),
)
def q_llm_ann_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEASURED ANN serving operating point, promoted to a
    registered query (round-10 verdict item 2; re-tuned rounds 12, 13
    and 15): the FULL FAISS-IVFPQ composite — IVF pruning at
    nprobe=8/16 cells over trained PQ with every dial at its costed
    setting — M=16 subspaces (4-dim cells, 16 code-bytes/vector),
    K=64 centroids/subspace, T=2 integer Lloyd training rounds, ADC
    top-R=400 shortlist re-ranked with EXACT integer L2 over the full
    quantized vectors, final top-5 per probe.

    The nprobe=8 re-baseline (round 15) rests on BOTH measured
    geometries in ANN_RECALL.md: on the near-random replicated
    fixture IVF pruning cannot clear the ≥0.95 recall bar (best
    composite 0.838, §Round-14 — cells carry no signal when vectors
    are isotropic), but on the clustered mixture-of-Gaussians fixture
    that models real corpus embeddings (50 Zipf-weighted topic
    clusters, within-cluster cosine ≈ 0.75), nprobe=8 × R=400 scores
    recall@5 **0.984 vs exhaustive's 0.986** at HALF the ADC
    candidate fraction (§Round-15 grid). Real corpora cluster; at
    100 TB, exhaustive ADC means scoring every corpus code for every
    probe, and halving that is the difference the coarse quantizer
    exists for. The dial stays: pass nprobe=None through pq_adc_topk
    for the exhaustive round-14 semantics on adversarially isotropic
    corpora (README §Semantics notes records the output-visible
    change). Earlier dials unchanged: M=16 dominates (r12/r13 grids),
    T=3 and OPQ-lite measured neutral. The oracle is exact at the
    composite point (same trained trajectory, same IVF assignment
    and per-probe cell opening, same shortlist, same re-rank —
    _ann_tuned_oracle() builds it at any operating point), so the
    tuned path is hash-checked end-to-end, not just recall-measured.

    Plan: q_llm_pq_trained_topk's pinned shape plus the IVF stage —
    the 16 pivot centroids broadcast, assignment is a map-combined
    argmin (the corpus shuffles once on vec_id), probed-cell
    membership joins broadcast-sized relations; K·M codebook rows
    stay broadcast (64·16), the ADC stage streams the surviving
    ~nprobe/16 of codes through one broadcast join into the salted
    two-stage top-R, and the exact re-rank touches full vectors for
    only R·|probes| candidates. At 100 TB the recall dial costs only
    what ANN_RECALL.md prices: candidate volume, never a new plan
    shape."""
    return pq_adc_topk(
        load_embeddings(spark, sf_dir),
        n_probes=10,
        k=5,
        rerank_r=_ANN_TUNED_R,
        train_rounds=_ANN_TUNED_T,
        pq_k=_ANN_TUNED_K,
        pq_m=_ANN_TUNED_M,
        opq=_ANN_TUNED_OPQ,
        nprobe=_ANN_TUNED_NPROBE,
    )


@register(
    "q_llm_zipf_fit",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t
        FROM documents WHERE text IS NOT NULL
    ),
    f AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS fr FROM tok GROUP BY t),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(fr) AS BIGINT) AS total_tokens
        FROM f
    ),
    top AS (SELECT t, fr FROM f ORDER BY fr DESC, t LIMIT 1000),
    r AS (
        SELECT fr, row_number() OVER (ORDER BY fr DESC, t) AS rnk
        FROM top
    ),
    l AS (
        SELECT CAST(floor(ln(rnk) * 1000000 + 0.5) AS BIGINT) AS x,
               CAST(floor(ln(fr) * 1000000 + 0.5) AS BIGINT) AS y
        FROM r
    ),
    m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx,
               CAST(SUM(y * y) AS HUGEINT) AS syy
        FROM l
    ),
    q AS (
        SELECT n,
               n * sxy - sx * sy AS num,
               n * sxx - sx * sx AS den,
               n * syy - sy * sy AS deny,
               sx, sy
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_ranked,
           tot.vocab_size, tot.total_tokens,
           CAST((num * 1000000) // den AS BIGINT) AS slope_e6,
           CAST((sy * den - num * sx) // (n * den) AS BIGINT)
               AS intercept_e6,
           CASE WHEN den = 0 OR deny = 0 THEN NULL ELSE CAST(
               ((num // 1000000) * (num // 1000000) * 1000000)
               // ((den // 1000000) * (deny // 1000000)) AS BIGINT)
           END AS r2_e6
    FROM q, tot
    """,
)
def q_llm_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: the
    log-log regression slope of frequency vs rank for the top-1000
    tokens — natural text sits near slope ≈ −1; a corpus whose
    exponent drifts (synthetic spam, boilerplate floods, tokenizer
    damage) flags itself in one number, with r² saying how Zipfian
    the fit actually is.

    Float discipline: the ONLY floats are the per-row ln(rank) and
    ln(freq) of exact integers, pinned to e6 half-up
    (floor(ln·1e6 + 0.5) — the bigram_ppl rule) before any sum, so
    accumulation is exact-integer in both engines. The regression is
    the exact-moment form: slope_e6 = (nΣxy − ΣxΣy)·1e6 DIV
    (nΣx² − (Σx)²) in DECIMAL(38,0)/HUGEINT; intercept via the same
    rational; r² pre-divides num/den/deny by 1e6 (engine-identical
    floors, rel. error ~1e-14) because num² alone would pass 1e38.

    Plan at 100 TB: wordcount groupBy (map-combined, the only
    corpus-sized exchange), TakeOrderedAndProject heap for the
    top-1000 (never a global sort), a row_number window over the
    1000-row relation (bounded global window, SCALING.md
    §global-windows), one single-row moment aggregate, and the tiny
    vocab-stats aggregate attached by broadcast."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.col("text"), " ")).alias("t"))
    )
    f = tok.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("fr"))
    tot = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("fr").cast("bigint").alias("total_tokens"),
    )
    top = f.orderBy(F.desc("fr"), "t").limit(1000)
    r = top.select(
        "fr",
        F.row_number()
        .over(Window.orderBy(F.desc("fr"), "t"))
        .alias("rnk"),
    )
    l = r.select(
        F.expr("CAST(floor(ln(rnk) * 1000000 + 0.5) AS BIGINT)").alias("x"),
        F.expr("CAST(floor(ln(fr) * 1000000 + 0.5) AS BIGINT)").alias("y"),
    )
    d38 = "decimal(38,0)"
    m = l.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(d38).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(d38).alias("syy"),
    )
    q = m.select(
        "n",
        "sx",
        "sy",
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("den"),
        F.expr("n * syy - sy * sy").alias("deny"),
    )
    return q.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("bigint").alias("n_ranked"),
        "vocab_size",
        "total_tokens",
        F.expr("CAST((num * 1000000) DIV den AS BIGINT)").alias("slope_e6"),
        F.expr(
            "CAST((sy * den - num * sx) DIV (n * den) AS BIGINT)"
        ).alias("intercept_e6"),
        F.expr(
            "CASE WHEN den = 0 OR deny = 0 THEN NULL ELSE CAST("
            " (CAST(num DIV 1000000 AS DECIMAL(38,0))"
            "  * CAST(num DIV 1000000 AS DECIMAL(38,0)) * 1000000)"
            " DIV (CAST(den DIV 1000000 AS DECIMAL(38,0))"
            "      * CAST(deny DIV 1000000 AS DECIMAL(38,0))) AS BIGINT) END"
        ).alias("r2_e6"),
    )


@register(
    "q_llm_pmi_bigrams",
    oracle="""
    WITH t AS (
        SELECT string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS p
        FROM t
    ),
    c12 AS (
        SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg GROUP BY 1, 2
    ),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
    c2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM c12 GROUP BY w2),
    tt AS (SELECT CAST(SUM(c12) AS BIGINT) AS t FROM c12),
    scored AS (
        SELECT b.w1, b.w2, b.c12,
               CAST(floor(ln(CAST(b.c12 AS DOUBLE) * tt.t
                             / (CAST(c1.c1 AS DOUBLE) * c2.c2))
                    * 1000000 + 0.5) AS BIGINT) AS pmi_e6
        FROM c12 b
        JOIN c1 ON b.w1 = c1.w1
        JOIN c2 ON b.w2 = c2.w2
        CROSS JOIN tt
        WHERE b.c12 >= 5
    )
    SELECT w1, w2, c12, pmi_e6
    FROM scored
    ORDER BY pmi_e6 DESC, w1, w2
    LIMIT 20
    """,
)
def q_llm_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by pointwise mutual information
    (min support 5) — the classic collocation/phrase-mining statistic
    (word2vec-era phrase induction, tokenizer-vocab seeding). PMI =
    ln(c₁₂·T / (c₁·c₂)) with c₁/c₂ the left/right positional
    marginals of the bigram table and T the total bigram count —
    every count an exact bigint, the one DOUBLE ln floor-pinned to
    e6 per pair (the chisq discipline; c₁₂·T and c₁·c₂ stay < 2^53
    so the products are exact). Deterministic top-20 on the unique
    (pmi_e6 DESC, w1, w2) key.

    Plan: one corpus pass builds map-combined (w1,w2) counts; the
    marginals are two map-combined re-aggregations OF THE PAIR TABLE
    (never a second corpus scan), T is a 1-row broadcast staple, and
    the support filter prunes the join input before the two marginal
    hash joins. Final top-20 is TakeOrderedAndProject. At 100 TB the
    exchanges carry (bigram, count) pairs only."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1,"
                "             element_at(toks, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").cast("bigint").alias("c2"))
    tt = c12.agg(F.sum("c12").cast("bigint").alias("t"))
    scored = (
        c12.filter(F.col("c12") >= 5)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            "c12",
            F.expr(
                "CAST(floor(ln(CAST(c12 AS DOUBLE) * t"
                " / (CAST(c1 AS DOUBLE) * c2)) * 1000000 + 0.5) AS BIGINT)"
            ).alias("pmi_e6"),
        )
    )
    return scored.orderBy(F.desc("pmi_e6"), "w1", "w2").limit(20)


@register(
    "q_llm_keyword_topk",
    oracle="""
    WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM t GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok, tf.tf, df.df,
               tf.tf * CAST(floor(ln(CAST(nn.n AS DOUBLE) / df.df)
                            * 1000000 + 0.5) AS BIGINT) AS score_e6
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN nn
    )
    SELECT doc_id, tok AS keyword, tf, df, score_e6,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY score_e6 DESC, tok) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def q_llm_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords — the keyword-extraction /
    document-tagging primitive of corpus curation UIs and topic
    drill-downs. idf is floor-pinned to e6 per token (ln(N/df), one
    DOUBLE op, the chisq discipline), the score tf·idf_e6 an exact
    bigint, and the per-doc top-3 deterministic on (score DESC, token).

    Plan: tf is one map-combined (doc, token) groupBy; df REUSES the
    tf relation (never a second corpus pass); N is a broadcast 1-row
    staple; the idf join keys on token (the df side is |vocab| rows);
    the rank window partitions BY DOC — each partition is one doc's
    distinct tokens, so at 100 TB the window is embarrassingly
    parallel with no skew beyond the longest document."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    tf = t.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    nn = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            (
                F.col("tf")
                * F.expr(
                    "CAST(floor(ln(CAST(n AS DOUBLE) / df) * 1000000 + 0.5)"
                    " AS BIGINT)"
                )
            ).alias("score_e6"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_e6"), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id", F.col("tok").alias("keyword"), "tf", "df", "score_e6", "rnk"
        )
    )


@register(
    "q_llm_kn_continuation",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT DISTINCT
               unnest(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
        FROM toks
    ),
    types AS (SELECT DISTINCT p.w1 AS w1, p.w2 AS w2 FROM bg),
    cont AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont FROM types GROUP BY w2
    ),
    tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM types)
    SELECT w2 AS word, cont,
           CAST((cont * 1000000) // tt.n_types AS BIGINT) AS p_cont_ppm
    FROM cont CROSS JOIN tt
    ORDER BY cont DESC, word
    LIMIT 50
    """,
)
def q_llm_kn_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser–Ney continuation counts: for each word, in how many
    DISTINCT left contexts it appears (bigram types, not tokens), and
    the continuation probability P_cont = cont(w)/|bigram types| —
    the statistic that makes KN smoothing beat add-k (a word frequent
    in one context only, like the second half of a fixed collocation,
    gets a LOW continuation weight however high its raw count; cf.
    q_llm_pmi_bigrams which surfaces those collocations). Top-50 on
    the unique (cont DESC, word) key; exact floored ppm.

    Plan: one corpus pass builds the DISTINCT bigram-type relation
    (map-side combine on the pair key); the continuation count is a
    re-aggregation OF THE TYPE TABLE; |types| is a 1-row broadcast
    staple; top-50 is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("t")).filter(
        F.size("t") >= 2
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "             element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    types = bg.distinct()
    cont = types.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("cont")
    )
    tt = types.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    return (
        cont.crossJoin(F.broadcast(tt))
        .select(
            F.col("w2").alias("word"),
            "cont",
            F.expr("CAST((cont * 1000000) DIV n_types AS BIGINT)").alias(
                "p_cont_ppm"
            ),
        )
        .orderBy(F.desc("cont"), "word")
        .limit(50)
    )


@register(
    "q_llm_lm_interp",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
        FROM toks
    ),
    dbg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
    c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM dbg WHERE doc_id % 2 = 0 GROUP BY w1, w2
    ),
    c1 AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1
    ),
    uni AS (
        SELECT tok AS w2, CAST(COUNT(*) AS BIGINT) AS cu FROM (
            SELECT unnest(t) AS tok FROM toks WHERE doc_id % 2 = 0
        ) GROUP BY tok
    ),
    tv AS (
        SELECT CAST(SUM(cu) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM uni
    ),
    scored AS (
        SELECT d.doc_id,
               CAST(floor(-ln(
                   CASE WHEN COALESCE(c1.c1, 0) > 0 THEN
                       0.75 * COALESCE(c12.c12, 0) / c1.c1 ELSE 0.0 END
                   + 0.25 * (COALESCE(uni.cu, 0) + 1.0)
                     / (tv.t + tv.v + 1.0)) * 1000000 + 0.5) AS BIGINT)
                   AS nll_e6
        FROM dbg d
        LEFT JOIN c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
        LEFT JOIN c1 ON d.w1 = c1.w1
        LEFT JOIN uni ON d.w2 = uni.w2
        CROSS JOIN tv
        WHERE d.doc_id % 2 = 1
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(nll_e6) // COUNT(*) AS BIGINT) AS avg_nll_e6
    FROM scored GROUP BY doc_id
    ORDER BY avg_nll_e6 DESC, doc_id LIMIT 20
    """,
)
def q_llm_lm_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out interpolated bigram LM eval: train Jelinek-Mercer
    counts on EVEN doc_ids, score ODD doc_ids with
    p(w2|w1) = 0.75*c12/c1 + 0.25*(cu+1)/(T+V+1) - the proper
    train/eval split q_llm_bigram_ppl (self-scored, add-one) does not
    have, and the linear-interpolation smoothing family KenLM-style
    filters actually use (unigram back-off floor handles unseen
    bigrams AND unseen unigrams, so every probability is > 0 and the
    surprisal total). Emits the 20 highest-perplexity held-out
    documents.

    Float discipline: one DOUBLE expression per scored bigram,
    composed character-identically on both engines (the CASE's bigram
    term, then the add-one unigram term), floor-pinned to e6 BEFORE
    the per-doc integer sum - the q_llm_bigram_ppl law, extended to
    an interpolated model.

    Plan: bigrams explode map-side; train counts map-combine on
    (w1, w2), w1, and w2; the 1-row (T, V) broadcast-attaches; the
    held-out stream left-joins counts on the SAME keys the counting
    shuffles produced, and the final per-doc sum moves (doc_id, int)
    pairs. Top-20 is TakeOrderedAndProject. Text never shuffles."""
    # fan_out was measured a loss on the identical bigram_ppl shape
    # (r16 paired A/B — light split+explode map stage, immediate
    # re-exchange at the counting groupBy); not applied here.
    d = load_table(spark, sf_dir, "documents")
    toks = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 2)
    dbg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1,"
                "             element_at(toks, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    train = dbg.filter(F.col("doc_id") % 2 == 0)
    c12 = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    uni = (
        toks.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode("toks").alias("w2"))
        .groupBy("w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    )
    tv = uni.agg(
        F.sum("cu").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    scored = (
        dbg.filter(F.col("doc_id") % 2 == 1)
        .join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(uni, "w2", "left")
        .crossJoin(F.broadcast(tv))
        .select(
            "doc_id",
            F.expr(
                "CAST(floor(-ln("
                " CASE WHEN COALESCE(c1, 0) > 0 THEN"
                " 0.75 * COALESCE(c12, 0) / c1 ELSE 0.0 END"
                " + 0.25 * (COALESCE(cu, 0) + 1.0)"
                " / (t + v + 1.0)) * 1000000 + 0.5) AS BIGINT)"
            ).alias("nll_e6"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.expr("CAST(SUM(nll_e6) DIV COUNT(*) AS BIGINT)").alias(
                "avg_nll_e6"
            ),
        )
        .orderBy(F.desc("avg_nll_e6"), "doc_id")
        .limit(20)
    )
