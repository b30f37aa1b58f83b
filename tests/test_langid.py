"""Trained char-n-gram language ID (functions/langid.py): ≥20-language
held-out accuracy, real Latin-script discrimination, dense-table
semantics, abstention, determinism, plan purity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.langid import (
    char_ngrams,
    classify_language,
    train_langid_classifier,
)

# -- synthetic language family: 24 mutually distinct phonotactic systems --
CONS = "bcdfghjklmnpqrstvwz"
VOW = "aeiouy"


def _lang_words(lang_idx: int, n_words: int = 40) -> list[str]:
    """Deterministic per-language vocabulary: each language draws its
    syllables from a rotated consonant/vowel inventory, so trigram
    distributions differ across languages but are stable within one."""
    rng = random.Random(1000 + lang_idx)
    cons = (CONS * 2)[lang_idx % len(CONS):][:7]
    vows = (VOW * 2)[lang_idx % len(VOW):][:3]
    words = []
    for _ in range(n_words):
        n_syll = rng.randint(2, 4)
        words.append(
            "".join(
                rng.choice(cons) + rng.choice(vows)
                + (rng.choice(cons) if rng.random() < 0.3 else "")
                for _ in range(n_syll)
            )
        )
    return words


def _doc(lang_idx: int, doc_idx: int, n_tokens: int = 30) -> str:
    rng = random.Random(lang_idx * 10_000 + doc_idx)
    words = _lang_words(lang_idx)
    return " ".join(rng.choice(words) for _ in range(n_tokens))


def test_heldout_accuracy_24_languages(spark):
    """Train on 10 docs/language across 24 synthetic languages, classify
    3 held-out docs each: ≥95% held-out accuracy (expected 100% — the
    trigram distributions are disjoint enough that errors indicate a
    bucketing/argmax bug, not model weakness)."""
    n_langs, n_train, n_test = 24, 10, 3
    train = spark.createDataFrame(
        [(f"L{i:02d}", _doc(i, j))
         for i in range(n_langs) for j in range(n_train)],
        "lang string, text string",
    )
    test = spark.createDataFrame(
        [(i * 100 + j, f"L{i:02d}", _doc(i, n_train + j))
         for i in range(n_langs) for j in range(n_test)],
        "doc_id long, true_lang string, text string",
    )
    weights = train_langid_classifier(
        train, "text", "lang"
    ).localCheckpoint(eager=True)
    # dense contract: every seen bucket carries a row for EVERY language
    n_buckets_seen = weights.select("bucket").distinct().count()
    assert weights.count() == n_buckets_seen * n_langs
    got = classify_language(test, weights, "text", "doc_id")
    acc = (
        got.select(
            (F.col("lang") == F.col("true_lang")).cast("int").alias("ok")
        ).agg(F.avg("ok")).collect()[0][0]
    )
    assert acc >= 0.95


REAL = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she was reading a book about the history of modern science",
        "they have been waiting for the train since early this morning",
        "what would you like to have for dinner tonight with your friends",
    ],
    "fr": [
        "le renard brun saute par dessus le chien paresseux pres de la riviere",
        "elle lisait un livre sur l'histoire des sciences modernes",
        "ils attendent le train depuis tot ce matin a la gare",
        "qu'est ce que tu voudrais manger ce soir avec tes amis",
    ],
    "de": [
        "der schnelle braune fuchs springt uber den faulen hund am fluss",
        "sie las ein buch uber die geschichte der modernen wissenschaft",
        "sie warten seit heute morgen auf den zug am bahnhof",
        "was mochtest du heute abend mit deinen freunden essen",
    ],
    "es": [
        "el rapido zorro marron salta sobre el perro perezoso junto al rio",
        "ella estaba leyendo un libro sobre la historia de la ciencia moderna",
        "ellos esperan el tren desde temprano esta manana en la estacion",
        "que te gustaria cenar esta noche con tus amigos en casa",
    ],
    "it": [
        "la rapida volpe marrone salta sopra il cane pigro vicino al fiume",
        "lei stava leggendo un libro sulla storia della scienza moderna",
        "aspettano il treno da stamattina presto alla stazione",
        "cosa vorresti mangiare stasera con i tuoi amici a casa",
    ],
    "pt": [
        "a rapida raposa marrom pula sobre o cachorro preguicoso perto do rio",
        "ela estava lendo um livro sobre a historia da ciencia moderna",
        "eles esperam o trem desde cedo esta manha na estacao",
        "o que voce gostaria de jantar hoje a noite com seus amigos",
    ],
}
REAL_TEST = {
    "en": "my friends are planning to visit the old city next week",
    "fr": "mes amis prevoient de visiter la vieille ville la semaine prochaine",
    "de": "meine freunde planen nachste woche die altstadt zu besuchen",
    "es": "mis amigos planean visitar la ciudad vieja la proxima semana",
    "it": "i miei amici hanno in programma di visitare la citta vecchia",
    "pt": "meus amigos planejam visitar a cidade velha na proxima semana",
}


def test_real_latin_script_languages(spark):
    """The gap this tier closes: six REAL Latin-script languages the
    script tier cannot separate, classified from held-out sentences."""
    train = spark.createDataFrame(
        [(lang, s) for lang, ss in REAL.items() for s in ss],
        "lang string, text string",
    )
    test = spark.createDataFrame(
        [(i, lang, s) for i, (lang, s) in enumerate(REAL_TEST.items())],
        "doc_id long, true_lang string, text string",
    )
    weights = train_langid_classifier(train, "text", "lang")
    got = classify_language(test, weights, "text", "doc_id")
    wrong = got.where(F.col("lang") != F.col("true_lang")).count()
    assert wrong == 0


def test_abstention_and_short_text(spark):
    """Empty/too-short texts yield NULL (honest abstention), not an
    arbitrary language."""
    train = spark.createDataFrame(
        [("en", REAL["en"][0]), ("fr", REAL["fr"][0])],
        "lang string, text string",
    )
    weights = train_langid_classifier(train, "text", "lang")
    test = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab")], "doc_id long, text string"
    )
    got = classify_language(test, weights, "text", "doc_id")
    assert all(r["lang"] is None for r in got.collect())


def test_training_is_deterministic(spark):
    train = spark.createDataFrame(
        [(lang, s) for lang, ss in REAL.items() for s in ss],
        "lang string, text string",
    )
    w1 = sorted(map(tuple, train_langid_classifier(
        train, "text", "lang").collect()))
    w2 = sorted(map(tuple, train_langid_classifier(
        train, "text", "lang").collect()))
    assert w1 == w2


def test_char_ngrams_expression(spark):
    got = spark.createDataFrame([("AbC d",)], "t string").select(
        char_ngrams(F.col("t"), 3).alias("g")
    ).collect()[0]["g"]
    assert got == ["abc", "bc ", "c d"]
    empty = spark.createDataFrame([("ab",)], "t string").select(
        char_ngrams(F.col("t"), 3).alias("g")
    ).collect()[0]["g"]
    assert empty == []


def test_classify_plan_is_native(spark):
    """No Python eval anywhere in train or classify (pure column
    expressions + joins/aggregates)."""
    train = spark.createDataFrame(
        [("en", REAL["en"][0]), ("fr", REAL["fr"][0])],
        "lang string, text string",
    )
    weights = train_langid_classifier(train, "text", "lang")
    test = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    out = classify_language(test, weights, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_oov_floor_scoring_matches_true_nb(spark):
    """Out-of-vocabulary grams are scored with the per-language FLOOR
    (the bucket=-1 rows), not skipped: the floor differs across
    languages with unequal corpus sizes, so skipping would shift the
    argmax away from NB-likelihood semantics.  Recomputes the winning
    score by hand from the exported table."""
    from evidence_datasource_parsers_spark.functions.langid import (
        _gram_bucket,
    )

    # 'big' trains on 20x the grams of 'sml'
    train = spark.createDataFrame(
        [("big", _doc(0, j, n_tokens=60)) for j in range(20)]
        + [("sml", _doc(1, 0, n_tokens=60))],
        "lang string, text string",
    )
    weights = train_langid_classifier(
        train, "text", "lang"
    ).localCheckpoint(eager=True)
    wrows = weights.collect()
    floors = {r.lang: r.weight for r in wrows if r.bucket == -1}
    table = {
        (r.bucket, r.lang): r.weight for r in wrows if r.bucket >= 0
    }
    # one floor row per language; the bigger corpus has the MORE
    # NEGATIVE floor (log(alpha / (tot + alpha*B)) falls with tot)
    assert set(floors) == {"big", "sml"}
    assert floors["big"] < floors["sml"]

    # a doc mixing trained text with OOV junk exercises both paths
    doc = _doc(0, 99, n_tokens=6) + " qxq wvw zjz qzv xwx"
    test = spark.createDataFrame(
        [(1, doc)], "doc_id long, text string"
    )
    got = classify_language(test, weights, "text", "doc_id").collect()[0]

    buckets = [
        r.b
        for r in test.select(
            F.explode(char_ngrams(F.col("text"), 3)).alias("__gram")
        )
        .where(F.length("__gram") == 3)
        .select(_gram_bucket(4096, "langid").alias("b"))
        .collect()
    ]
    trained_buckets = {b for (b, _) in table}
    n_oov = sum(1 for b in buckets if b not in trained_buckets)
    assert n_oov > 0  # the junk tail must actually miss the table
    expected = {
        lang: sum(
            table[(b, lang)] for b in buckets if b in trained_buckets
        )
        + n_oov * floors[lang]
        for lang in ("big", "sml")
    }
    win = max(sorted(expected), key=lambda k: expected[k])
    assert got["lang"] == win
    assert got["lang_score"] == expected[win]
