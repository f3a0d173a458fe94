"""HTML main-content extraction — the raw-web -> text head of an LLM
data pipeline (the trafilatura / jusText step; VERDICT r11 #2).

Every downstream text operator (``doc_text_stats``, quality scores,
dedup, tokenizers) presupposes a clean ``text`` column; a real corpus
starts at HTML. This operator turns markup into main-content text:

1. drop ``<script>``/``<style>`` element bodies and HTML comments,
2. segment into blocks at block-level tag boundaries
   (``</p> </div> </h1..6> </li> <br> ...``),
3. per block, strip remaining tags, unescape the common entities,
   collapse whitespace,
4. drop boilerplate blocks by LINK DENSITY (share of block text that
   sits inside ``<a>`` elements — nav bars / footers are nearly 100%
   link text; body prose is not), the jusText heuristic,
5. join surviving blocks with newlines.

Everything is a single JVM-side projection (regexp + higher-order
array functions — fuses into the parquet scan; zero shuffle, zero
Python), so at 100 TB it runs at scan speed. All regexes stay in the
Java/RE2-common subset (no backreferences, no lookaround) so the
DuckDB oracle replays them char-for-char — the same cross-engine
contract ``pii_scrub`` established.

Honest scope: a regex segmenter, not an HTML5 tree parser — CDATA,
nested same-tag elements and malformed markup beyond the fixture's
shapes are out of scope (a tree parser cannot be expressed as a
vectorized column expression; at scale this heuristic is what
CommonCrawl-size pipelines actually run first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2/Java-common subset: (?i)(?s) inline flags, (?:...) groups,
# non-greedy quantifiers, \s classes. No backreferences — script and
# style get their own patterns instead of a captured tag name.
SCRIPT_RE = r"(?is)<script(?:\s[^>]*)?>.*?</script\s*>"
STYLE_RE = r"(?is)<style(?:\s[^>]*)?>.*?</style\s*>"
COMMENT_RE = r"(?s)<!--.*?-->"
BLOCK_SPLIT_RE = (
    r"(?i)<(?:/title|/p|/h[1-6]|/div|/li|/ul|/ol|/table|/tr|/td|/header"
    r"|/footer|/nav|/section|/article|/blockquote|br\s*/?)\s*>"
)
ANCHOR_RE = r"(?is)<a(?:\s[^>]*)?>.*?</a\s*>"
TAG_RE = r"(?s)<[^>]*>"
WS_RE = r"\s+"

# entity -> replacement, applied tags-first then entities, with &amp;
# LAST so '&amp;lt;' decodes to '&lt;' (literal), not '<'
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

DEFAULT_MAX_LINK_DENSITY_BP = 4000  # drop blocks >40% link text


def _block_text(b: Column) -> Column:
    """Visible text of one block: strip tags, unescape entities,
    collapse whitespace."""
    t = F.regexp_replace(b, TAG_RE, " ")
    for ent, rep in ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, WS_RE, " "))


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    max_link_density_bp: int = DEFAULT_MAX_LINK_DENSITY_BP,
) -> DataFrame:
    """Add ``main_text`` plus block-accounting columns to ``df``.

    Link density is computed tag-aware: ``nolink`` is the block's text
    with whole ``<a>...</a>`` elements removed first, so
    ``len(txt) - len(nolink)`` is the anchor-text share. The density
    test is pure integer arithmetic (``link*10000 <= bp*total``) —
    bit-identical across engines, no float division.
    """
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(html_col), SCRIPT_RE, " "),
            STYLE_RE,
            " ",
        ),
        COMMENT_RE,
        " ",
    )
    blocks = F.transform(
        F.split(cleaned, BLOCK_SPLIT_RE),
        lambda b: F.struct(
            _block_text(b).alias("txt"),
            _block_text(F.regexp_replace(b, ANCHOR_RE, " ")).alias(
                "nolink"
            ),
        ),
    )
    nonempty = F.filter(blocks, lambda s: F.length(s.txt) > 0)
    kept = F.filter(
        nonempty,
        lambda s: (F.length(s.txt) - F.length(s.nolink)) * 10000
        <= F.lit(max_link_density_bp) * F.length(s.txt),
    )
    main_text = F.array_join(F.transform(kept, lambda s: s.txt), "\n")
    return (
        df.withColumn("_ne", nonempty)
        .withColumn("_kept", kept)
        .select(
            *df.columns,
            F.size("_ne").cast("bigint").alias("n_blocks"),
            F.size("_kept").cast("bigint").alias("n_blocks_kept"),
            F.array_join(
                F.transform(F.col("_kept"), lambda s: s.txt), "\n"
            ).alias("main_text"),
        )
        .withColumn(
            "n_chars_kept", F.length("main_text").cast("bigint")
        )
    )
