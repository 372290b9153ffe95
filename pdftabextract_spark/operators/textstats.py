"""Text analysis operators for corpus curation: language-ID heuristic,
quality scoring, token counting, fingerprinting. Pure JVM expressions
(higher-order array functions + regexes); deterministic and
oracle-portable."""

from pyspark.sql import DataFrame, functions as F

LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "sqlish": ["table", "join", "query", "scan"],
    "sparkish": ["spark", "batch", "stream", "shuffle"],
}


def _stopword_hits(words_col, words):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(words_col, lambda w: F.array_contains(arr, w)))


def langid(docs: DataFrame, text_col="text", id_col="doc_id",
           stopwords=None) -> DataFrame:
    """Stopword-vote language guess (deterministic tie order = dict
    order; 'unknown' when no list scores)."""
    stopwords = stopwords or LANG_STOPWORDS
    ws = F.split(text_col, " ")
    scores = {lang: _stopword_hits(ws, wl) for lang, wl in stopwords.items()}
    langs = list(scores)
    guess = None
    for i, lang in enumerate(langs):
        cond = (scores[lang] > 0)
        for other in langs[i + 1:]:
            cond = cond & (scores[lang] >= scores[other])
        branch = F.when(cond, F.lit(lang))
        guess = branch if guess is None else guess.when(cond, F.lit(lang))
    guess = guess.otherwise(F.lit("unknown"))
    return docs.select(F.col(id_col).alias("doc_id"), guess.alias("lang_guess"))


def quality_score(docs: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """Composite quality in [0,1]: word count, mean word length, stopword
    ratio. Rounded via floor(x*1e6+0.5)/1e6 (portable double rounding)."""
    ws = F.split(text_col, " ")
    n_words = F.size(ws)
    mean_len = F.length(F.regexp_replace(text_col, " ", "")) / n_words
    stop_ratio = _stopword_hits(ws, ["the", "a", "of"]) / n_words
    raw = (F.least(F.lit(1.0), n_words / F.lit(100.0)) * 0.5
           + F.least(F.lit(1.0), mean_len / F.lit(8.0)) * 0.3
           + (1 - stop_ratio) * 0.2)
    score = F.floor(raw * 1e6 + 0.5) / 1e6
    return docs.select(F.col(id_col).alias("doc_id"),
                       n_words.cast("long").alias("n_words"),
                       score.alias("quality"))


def token_counts(docs: DataFrame, text_col="text", id_col="doc_id",
                 token_regex="[a-z]+|[0-9]+") -> DataFrame:
    """Whitespace and regex token counts."""
    ws_tokens = F.size(F.filter(F.split(text_col, " "), lambda w: w != ""))
    re_tokens = F.size(F.expr(
        f"regexp_extract_all({text_col}, '{token_regex}', 0)"))
    return docs.select(F.col(id_col).alias("doc_id"),
                       ws_tokens.cast("long").alias("ws_tokens"),
                       re_tokens.cast("long").alias("re_tokens"))


def fingerprint(docs: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """Normalization fingerprint: md5(lower(trimmed, space-collapsed))."""
    norm = F.lower(F.regexp_replace(F.trim(text_col), " +", " "))
    return docs.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fp"))


def char_bigram_entropy(docs: DataFrame, text_col="text",
                        id_col="doc_id") -> DataFrame:
    """Shannon entropy (bits) of the character-bigram distribution per
    document — a model-free quality/gibberish signal: natural prose sits
    in a band (~6-8 bits at paragraph length), mashed-keyboard noise runs
    high for its length, and boilerplate repetition runs low. Pure JVM
    expressions: bigram explode -> counts -> -sum(p*log2(p)); documents
    shorter than 2 chars have no distribution and drop out (same in the
    SQL oracle)."""
    from pyspark.sql import Window as W
    # the length guard matters: Spark's sequence(1, 0) counts DOWN
    # ([1, 0]) instead of returning empty, so 1-char docs would emit
    # phantom bigrams; explode(NULL) emits nothing
    bigrams = F.when(F.length(text_col) >= 2, F.expr(
        f"transform(sequence(1, length({text_col}) - 1),"
        f" i -> substring({text_col}, i, 2))"))
    bi = docs.select(F.col(id_col).alias("doc_id"),
                     F.explode(bigrams).alias("bg"))
    counts = bi.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    tot = F.sum("c").over(W.partitionBy("doc_id"))
    p = F.col("c") / tot
    return (counts.select("doc_id", (-p * F.log2(p)).alias("_t"))
            .groupBy("doc_id")
            .agg(F.round(F.sum("_t"), 6).alias("bigram_entropy")))
