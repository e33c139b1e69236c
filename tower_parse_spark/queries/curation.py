"""Corpus-curation queries: URL/domain hygiene, semantic dedup,
multimodal near-dup (round 7's new oracle-backed surface).

Same portability contract as queries/llm.py: the DuckDB SQL twins are
generated from the engine's own constants (regex patterns, blocklists,
thresholds) so the two sides cannot drift, and every float aggregate is
rounded identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tower_parse_spark.operators import multimodal as M
from tower_parse_spark.operators import semdedup as SD
from tower_parse_spark.operators import urls as U
from tower_parse_spark.queries import Query
from tower_parse_spark.session import load_table

# ---------------------------------------------------------------------------
# URL / domain curation (C4 / RefinedWeb methodology)
# ---------------------------------------------------------------------------

#: blocklisted domains for the registry query (three domains that occur
#: in the synthesized URL set)
BLOCKLIST = ("src6.example.com", "src13.example.org", "src17.example.net")
#: per-domain survivor cap for the registry query
DOMAIN_CAP = 3


def _docs_with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic URLs from ``documents`` (source +
    doc_id), the established fixture-augmentation pattern: the raw
    table carries no URL column, so one is derived row-locally with
    every pathology the curation funnel must handle — mixed-case scheme
    and host, explicit default port, tracking parameters (doc-unique
    fbclid values), fragments, and genuine duplicates (URL identity
    keys on ``doc_id % 100``, so ~n/100 docs share each canonical URL
    while their raw strings differ)."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k = d % 100
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")),
        ((k % 3) + 1).cast("int"),
    )
    host = F.concat(F.lit("www."), F.col("source"), F.lit(".example."), tld)
    url = F.concat(
        F.when(d % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(d % 4 == 1, F.upper(host)).otherwise(host),
        F.when(d % 7 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/articles/item-"),
        k.cast("string"),
        F.when(d % 3 == 2, F.concat(F.lit("/p"), d.cast("string"))).otherwise(
            F.lit("")
        ),
        F.lit("?q="),
        (k % 7).cast("string"),
        F.when(d % 3 == 1, F.lit("&utm_source=feed&utm_medium=rss")).otherwise(
            F.lit("")
        ),
        F.when(d % 9 == 2, F.concat(F.lit("&fbclid=fb"), d.cast("string"))).otherwise(
            F.lit("")
        ),
        F.when(d % 6 == 5, F.concat(F.lit("#sec"), d.cast("string"))).otherwise(
            F.lit("")
        ),
    )
    return docs.select("doc_id", url.alias("url"))


def domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain curation funnel over the synthesized URL table:
    canonicalize -> URL-level exact dedup -> domain blocklist ->
    per-domain cap, reported as one verdict row per document
    (operators/urls.py::curate_urls — row-local regexp projections, one
    map-side-combinable hash agg, one survivors-only rank window)."""
    return U.curate_urls(
        _docs_with_urls(spark, sf_dir),
        blocklist=BLOCKLIST,
        domain_cap=DOMAIN_CAP,
    ).orderBy("doc_id")


_URLS_SQL = """
u AS (
  SELECT doc_id, source, doc_id % 100 AS k FROM documents
), h AS (
  SELECT doc_id, k,
         'www.' || source || '.example.' ||
         (CASE k % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END)
           AS host
  FROM u
), raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
    (CASE WHEN doc_id % 4 = 1 THEN upper(host) ELSE host END) ||
    (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END) ||
    '/articles/item-' || CAST(k AS VARCHAR) ||
    (CASE WHEN doc_id % 3 = 2 THEN '/p' || CAST(doc_id AS VARCHAR)
          ELSE '' END) ||
    '?q=' || CAST(k % 7 AS VARCHAR) ||
    (CASE WHEN doc_id % 3 = 1 THEN '&utm_source=feed&utm_medium=rss'
          ELSE '' END) ||
    (CASE WHEN doc_id % 9 = 2 THEN '&fbclid=fb' || CAST(doc_id AS VARCHAR)
          ELSE '' END) ||
    (CASE WHEN doc_id % 6 = 5 THEN '#sec' || CAST(doc_id AS VARCHAR)
          ELSE '' END) AS url
  FROM h
)
"""

# the oracle runs the engine's own regex constants verbatim
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#?]*\?([^#]*)"

DOMAIN_CURATION_ORACLE = f"""
WITH {_URLS_SQL},
parts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{_SCHEME_RE}', 1)) AS scheme,
         regexp_replace(
           lower(regexp_extract(url, '{_HOSTPORT_RE}', 1)),
           '{U.DEFAULT_PORT_RE}', '') AS host,
         regexp_extract(url, '{_PATH_RE}', 1) AS path,
         regexp_extract(url, '{_QUERY_RE}', 1) AS q
  FROM raw
), canon AS (
  SELECT doc_id,
         scheme || '://' || host ||
         (CASE WHEN path = '' THEN '/' ELSE path END) ||
         (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS canon_url,
         regexp_replace(host, '^www\\.', '') AS domain
  FROM (
    SELECT *, array_to_string(
      list_filter(str_split(q, '&'),
                  p -> p <> '' AND NOT regexp_matches(p, '{U.TRACKING_PARAM_RE}')),
      '&') AS cq
    FROM parts
  )
), keepers AS (
  SELECT canon_url, min(doc_id) AS keep_id FROM canon GROUP BY canon_url
), flags AS (
  SELECT c.doc_id, c.canon_url, c.domain,
         (c.canon_url IS NULL
          OR NOT regexp_matches(c.canon_url, '{_SCHEME_RE}')) AS malformed,
         (c.canon_url IS NOT NULL
          AND regexp_matches(c.canon_url, '{_SCHEME_RE}')
          AND c.doc_id <> k.keep_id) AS is_url_dup,
         coalesce(c.domain IN {BLOCKLIST!r}, FALSE) AS blocked
  FROM canon c LEFT JOIN keepers k USING (canon_url)
), surv AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rnk
  FROM flags WHERE NOT malformed AND NOT is_url_dup AND NOT blocked
)
SELECT f.doc_id, f.canon_url, f.domain, f.malformed, f.is_url_dup,
       f.blocked,
       coalesce(s.rnk > {DOMAIN_CAP}, FALSE) AS over_cap,
       coalesce(s.rnk <= {DOMAIN_CAP}, FALSE) AS kept
FROM flags f LEFT JOIN surv s USING (doc_id)
ORDER BY f.doc_id
"""


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup — Abbas et al. 2023)
# ---------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = 0.9


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embedding corpus plus
    perturbed near-copies (the same known-duplicate injection the
    embedding-cosine dedup query uses): cluster via the coarse
    quantizer, drop within-cluster members whose cosine to a
    centroid-nearer member is >= 0.9, keep the centroid-nearest
    representative (operators/semdedup.py)."""
    from tower_parse_spark.queries.llm import _emb_with_near_copies

    return SD.semantic_dedup_flags(
        _emb_with_near_copies(spark, sf_dir),
        dim=64,
        threshold=SEMDEDUP_THRESHOLD,
    ).orderBy("vec_id")


def _semantic_dedup_oracle() -> str:
    from tower_parse_spark.queries.llm import (
        _EMB_NEAR_COPIES_SQL,
        _sql_ivf_cells,
        _sql_lsh_bucket,
    )

    cos = (
        "list_sum(list_transform(list_zip(a.embedding, b.embedding),"
        " p -> p[1]*p[2])) / (a.nv * b.nv)"
    )
    return f"""
WITH {_EMB_NEAR_COPIES_SQL},
emb AS (
  SELECT vec_id, embedding FROM emb2
), scored_cells AS ({_sql_ivf_cells()}
), assigned AS (
  SELECT sc.vec_id, sc.embedding,
         coalesce(list_position(sc.s, list_max(sc.s)), 0) AS cell,
         round(list_max(sc.s), 4) AS cent_cos,
         sqrt(list_sum(list_transform(sc.embedding, x -> x * x))) AS nv,
         ({_sql_lsh_bucket()}) AS blk
  FROM scored_cells sc
), better AS (
  SELECT b.vec_id AS vid, count(*) AS n_better
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.blk = b.blk AND a.vec_id <> b.vec_id
   AND (a.cent_cos > b.cent_cos
        OR (a.cent_cos = b.cent_cos AND a.vec_id < b.vec_id))
  WHERE a.nv > 0 AND b.nv > 0
    AND round({cos}, 4) >= {SEMDEDUP_THRESHOLD}
  GROUP BY b.vec_id
)
SELECT e.vec_id,
       CAST(e.cell AS BIGINT) AS cell,
       e.cent_cos,
       CAST(coalesce(p.n_better, 0) AS BIGINT) AS n_better,
       coalesce(p.n_better, 0) > 0 AS is_semdup,
       coalesce(p.n_better, 0) = 0 AS keep
FROM assigned e LEFT JOIN better p ON e.vec_id = p.vid
ORDER BY e.vec_id
"""


# ---------------------------------------------------------------------------
# Multimodal perceptual-hash near-dup
# ---------------------------------------------------------------------------


def multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs over the multimodal payload table
    (documents ∪ exact copies, so every payload has a planted Hamming-0
    partner): Arrow-batched perceptual hashing then Hamming-band
    blocked pair generation (operators/multimodal.py::with_phash /
    phash_near_dup_pairs). The stub hasher is arithmetic on the byte
    length, so the full distributed pipeline — mapInPandas stage, band
    explode, bucket self-join, bit_count scoring — has an exact SQL
    twin; the Pillow dHash path swaps in behind the same contract."""
    from tower_parse_spark.queries.llm import _docs_with_copies

    ph = M.with_phash(M.with_payload(_docs_with_copies(spark, sf_dir)))
    return M.phash_near_dup_pairs(ph).orderBy("id1", "id2")


def _multimodal_near_dup_oracle() -> str:
    from tower_parse_spark.queries.llm import _DOCS_WITH_COPIES_SQL

    mask = (1 << M.PHASH_BAND_BITS) - 1
    bands = ", ".join(str(b) for b in range(M.PHASH_BANDS))
    return f"""
WITH {_DOCS_WITH_COPIES_SQL},
ph AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {M.PHASH_BITS}),
              j -> (((octet_length(encode(text)) * (2*j + 3)) % 97) % 2)
                   * (CAST(1 AS BIGINT) << j))) AS BIGINT) AS phash
  FROM docs2
), banded AS (
  SELECT doc_id, phash,
         b * {1 << M.PHASH_BAND_BITS} +
         ((phash >> (b * {M.PHASH_BAND_BITS})) & {mask}) AS bkey
  FROM ph CROSS JOIN (SELECT unnest([{bands}]) AS b) t
), cand AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
         l.phash AS ph1, r.phash AS ph2
  FROM banded l JOIN banded r USING (bkey)
  WHERE l.doc_id < r.doc_id
)
SELECT id1, id2, CAST(bit_count(xor(ph1, ph2)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ph1, ph2)) <= {M.PHASH_MAX_HAMMING}
ORDER BY id1, id2
"""


QUERIES = {
    "domain_curation": Query(
        domain_curation,
        DOMAIN_CURATION_ORACLE,
        "URL canonicalize -> URL dedup -> domain blocklist -> domain cap",
    ),
    "semantic_dedup": Query(
        semantic_dedup,
        _semantic_dedup_oracle(),
        "SemDeDup: within-cluster cosine pruning, centroid-nearest kept",
    ),
    "multimodal_near_dup": Query(
        multimodal_near_dup,
        _multimodal_near_dup_oracle(),
        "perceptual-hash image near-dup via Hamming-band blocking",
    ),
}
