"""Character-trigram language identification (10 languages).

Replaces the 3-language/4-marker stand-in in operators/text_analysis.py
with a real reference-free classifier in the Cavnar-Trenkle n-gram-profile
family: each language is represented by its top-k most frequent character
trigrams (built deterministically at import from a small built-in seed
corpus); a document is scored per language by how many of its trigram
occurrences appear in that language's profile, and labeled with the
best-scoring language (ties -> lexicographically smallest language;
no hits at all -> ``und``).

Everything is engine-portable arithmetic on purpose:

- normalization = ``lower(regexp_replace(text, '[^\\p{L} ]', ' '))`` —
  identical semantics in Spark (Java regex) and DuckDB (RE2), pinned by
  the driver's ``lang_id_trigram`` oracle row;
- trigrams = all length-3 substrings of the normalized text (1-indexed
  ``substring``, positions ``1 .. len-2``);
- scoring = inner join against the (trigram, language, weight) profile
  table + an integer sum, i.e. plain relational algebra — NO per-row
  Python anywhere. Weights are discriminative: a trigram appearing in
  only one language's profile scores ``NUM_LANGS``, one appearing in
  every profile scores 1 (integer arithmetic on purpose — exact and
  order-independent in both engines, so the argmax can never flip
  between Spark and DuckDB).

Scale shape: the profile is a <=4k-row table — broadcast to every
executor; the per-document trigram explode is linear in text size and the
score aggregation is one map-side-partial ``min_by``. At 100 TB this is
scan + broadcast-hash-join + partial agg: no skew risk (profile keys are
uniform), no shuffle wider than (doc_id, lang, count).

Languages (all Latin-script with engine-stable case folding — Turkish-
style dotted/dotless ``i`` is deliberately excluded because Java and RE2
lowercase it differently): da de en es fi fr it nl pt sv.

Accuracy is pinned >= 0.95 on a held-out multilingual fixture in
tests/test_text_analysis.py (sentences disjoint from the seed corpus).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Seed corpus: six original everyday-prose passages per language,
# pre-lowercased (profile construction then needs no case folding).
# These are the PROFILE source only — the accuracy fixture in tests is
# disjoint text.
SEED_CORPUS: dict[str, tuple[str, ...]] = {
    "en": (
        "the quick brown fox jumps over the lazy dog while the children"
        " are playing in the garden and the weather is very nice today"
        " because the sun is shining and there will be no rain this"
        " afternoon which makes everyone happy about the plans for the"
        " weekend",
        "many people believe that reading books is one of the best ways"
        " to learn new things about the world and about themselves",
        "yesterday evening we walked along the river and talked about"
        " our work our families and the small things that make life"
        " interesting",
        "in the morning she goes to the market to buy fresh bread cheese"
        " and vegetables for the soup that her grandmother used to make"
        " every winter",
        "the old city has narrow streets small shops and a beautiful"
        " church near the harbor where the fishermen sell their catch"
        " early in the morning",
        "he works at the hospital during the week and on sunday he likes"
        " to ride his bicycle through the forest with his friends",
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund während"
        " die kinder im garten spielen und das wetter heute sehr schön"
        " ist weil die sonne scheint und es am nachmittag keinen regen"
        " geben wird was alle über die pläne für das wochenende"
        " glücklich macht",
        "viele menschen glauben dass das lesen von büchern eine der"
        " besten möglichkeiten ist um neue dinge über die welt und über"
        " sich selbst zu lernen",
        "gestern abend sind wir am fluss entlang spaziert und haben über"
        " unsere arbeit unsere familien und die kleinen dinge gesprochen"
        " die das leben interessant machen",
        "am morgen geht sie auf den markt um frisches brot käse und"
        " gemüse für die suppe zu kaufen die ihre großmutter früher jeden"
        " winter gekocht hat",
        "die altstadt hat enge gassen kleine läden und eine schöne kirche"
        " am hafen wo die fischer früh am morgen ihren fang verkaufen",
        "er arbeitet unter der woche im krankenhaus und am sonntag fährt"
        " er gern mit seinen freunden mit dem fahrrad durch den wald",
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux"
        " pendant que les enfants jouent dans le jardin et le temps est"
        " très beau aujourd'hui parce que le soleil brille et il n'y"
        " aura pas de pluie cet après midi ce qui rend tout le monde"
        " heureux des projets pour la fin de semaine",
        "beaucoup de gens croient que la lecture des livres est une des"
        " meilleures façons d'apprendre de nouvelles choses sur le monde"
        " et sur soi même",
        "hier soir nous avons marché le long de la rivière et nous avons"
        " parlé de notre travail de nos familles et des petites choses"
        " qui rendent la vie intéressante",
        "le matin elle va au marché pour acheter du pain frais du fromage"
        " et des légumes pour la soupe que sa grand mère préparait chaque"
        " hiver",
        "la vieille ville a des rues étroites de petits magasins et une"
        " belle église près du port où les pêcheurs vendent leur poisson"
        " tôt le matin",
        "il travaille à l'hôpital pendant la semaine et le dimanche il"
        " aime faire du vélo dans la forêt avec ses amis",
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso mientras"
        " los niños juegan en el jardín y el tiempo está muy bueno hoy"
        " porque el sol brilla y no habrá lluvia esta tarde lo que hace"
        " que todos estén felices con los planes para el fin de semana",
        "mucha gente cree que leer libros es una de las mejores maneras"
        " de aprender cosas nuevas sobre el mundo y sobre uno mismo",
        "ayer por la tarde caminamos junto al río y hablamos de nuestro"
        " trabajo nuestras familias y las pequeñas cosas que hacen la"
        " vida interesante",
        "por la mañana ella va al mercado a comprar pan fresco queso y"
        " verduras para la sopa que su abuela preparaba cada invierno",
        "la ciudad vieja tiene calles estrechas tiendas pequeñas y una"
        " iglesia hermosa cerca del puerto donde los pescadores venden su"
        " pescado temprano por la mañana",
        "él trabaja en el hospital durante la semana y los domingos le"
        " gusta montar en bicicleta por el bosque con sus amigos",
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro mentre i"
        " bambini giocano nel giardino e il tempo è molto bello oggi"
        " perché il sole splende e non ci sarà pioggia questo pomeriggio"
        " il che rende tutti felici dei programmi per il fine settimana",
        "molte persone credono che leggere libri sia uno dei modi"
        " migliori per imparare cose nuove sul mondo e su se stessi",
        "ieri sera abbiamo camminato lungo il fiume e abbiamo parlato"
        " del nostro lavoro delle nostre famiglie e delle piccole cose"
        " che rendono la vita interessante",
        "la mattina lei va al mercato a comprare pane fresco formaggio e"
        " verdure per la zuppa che sua nonna preparava ogni inverno",
        "la città vecchia ha strade strette piccoli negozi e una bella"
        " chiesa vicino al porto dove i pescatori vendono il loro pesce"
        " la mattina presto",
        "lui lavora in ospedale durante la settimana e la domenica gli"
        " piace andare in bicicletta nel bosco con i suoi amici",
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cão preguiçoso enquanto as"
        " crianças brincam no jardim e o tempo está muito bom hoje"
        " porque o sol brilha e não haverá chuva esta tarde o que deixa"
        " todos felizes com os planos para o fim de semana",
        "muitas pessoas acreditam que ler livros é uma das melhores"
        " maneiras de aprender coisas novas sobre o mundo e sobre si"
        " mesmo",
        "ontem à noite caminhamos ao longo do rio e falamos sobre o"
        " nosso trabalho as nossas famílias e as pequenas coisas que"
        " tornam a vida interessante",
        "de manhã ela vai ao mercado comprar pão fresco queijo e legumes"
        " para a sopa que a sua avó costumava fazer todos os invernos",
        "a cidade velha tem ruas estreitas lojas pequenas e uma igreja"
        " bonita perto do porto onde os pescadores vendem o seu peixe de"
        " manhã cedo",
        "ele trabalha no hospital durante a semana e ao domingo gosta de"
        " andar de bicicleta pela floresta com os seus amigos",
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond terwijl de"
        " kinderen in de tuin spelen en het weer vandaag erg mooi is"
        " omdat de zon schijnt en er vanmiddag geen regen zal zijn"
        " waardoor iedereen blij is met de plannen voor het weekend",
        "veel mensen geloven dat het lezen van boeken een van de beste"
        " manieren is om nieuwe dingen te leren over de wereld en over"
        " zichzelf",
        "gisteravond liepen we langs de rivier en praatten we over ons"
        " werk onze gezinnen en de kleine dingen die het leven"
        " interessant maken",
        "s ochtends gaat zij naar de markt om vers brood kaas en groenten"
        " te kopen voor de soep die haar grootmoeder vroeger elke winter"
        " maakte",
        "de oude stad heeft smalle straten kleine winkels en een mooie"
        " kerk bij de haven waar de vissers s ochtends vroeg hun vis"
        " verkopen",
        "hij werkt door de week in het ziekenhuis en op zondag fietst hij"
        " graag met zijn vrienden door het bos",
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden medan barnen"
        " leker i trädgården och vädret är mycket fint idag eftersom"
        " solen skiner och det inte kommer att regna i eftermiddag"
        " vilket gör alla glada över planerna för helgen",
        "många människor tror att läsa böcker är ett av de bästa sätten"
        " att lära sig nya saker om världen och om sig själv",
        "igår kväll promenerade vi längs floden och pratade om vårt"
        " arbete våra familjer och de små sakerna som gör livet"
        " intressant",
        "på morgonen går hon till marknaden för att köpa färskt bröd ost"
        " och grönsaker till soppan som hennes mormor brukade laga varje"
        " vinter",
        "den gamla staden har smala gator små butiker och en vacker kyrka"
        " vid hamnen där fiskarna säljer sin fisk tidigt på morgonen",
        "han arbetar på sjukhuset under veckan och på söndagar tycker han"
        " om att cykla genom skogen med sina vänner",
    ),
    "fi": (
        "nopea ruskea kettu hyppää laiskan koiran yli kun lapset"
        " leikkivät puutarhassa ja sää on tänään erittäin kaunis koska"
        " aurinko paistaa eikä iltapäivällä sada vettä mikä tekee kaikki"
        " iloisiksi viikonlopun suunnitelmista",
        "monet ihmiset uskovat että kirjojen lukeminen on yksi"
        " parhaista tavoista oppia uusia asioita maailmasta ja"
        " itsestään",
        "eilen illalla kävelimme joen vartta pitkin ja puhuimme"
        " työstämme perheistämme ja pienistä asioista jotka tekevät"
        " elämästä mielenkiintoisen",
        "aamulla hän menee torille ostamaan tuoretta leipää juustoa ja"
        " vihanneksia keittoon jota hänen isoäitinsä tapasi valmistaa"
        " joka talvi",
        "vanhassa kaupungissa on kapeita katuja pieniä kauppoja ja kaunis"
        " kirkko sataman lähellä jossa kalastajat myyvät kalansa varhain"
        " aamulla",
        "hän työskentelee sairaalassa viikolla ja sunnuntaisin hän"
        " pyöräilee mielellään metsän läpi ystäviensä kanssa",
    ),
    "da": (
        "den hurtige brune ræv springer over den dovne hund mens"
        " børnene leger i haven og vejret er meget fint i dag fordi"
        " solen skinner og det ikke kommer til at regne i eftermiddag"
        " hvilket gør alle glade for planerne for weekenden",
        "mange mennesker tror at det at læse bøger er en af de bedste"
        " måder at lære nye ting om verden og om sig selv",
        "i går aftes gik vi langs floden og talte om vores arbejde"
        " vores familier og de små ting der gør livet interessant",
        "om morgenen går hun på markedet for at købe frisk brød ost og"
        " grøntsager til suppen som hendes bedstemor plejede at lave hver"
        " vinter",
        "den gamle by har smalle gader små butikker og en smuk kirke ved"
        " havnen hvor fiskerne sælger deres fisk tidligt om morgenen",
        "han arbejder på hospitalet i løbet af ugen og om søndagen kan"
        " han godt lide at cykle gennem skoven med sine venner",
    ),
}

DEFAULT_K = 400
NORM_PATTERN = r"[^\p{L} ]"


def _normalize_py(text: str) -> str:
    """Python mirror of the engine normalization (profiles only — the
    seed corpus is already lowercase and contains only letters, spaces,
    and apostrophes, where isalpha() and \\p{L} agree)."""
    return "".join(ch if (ch.isalpha() or ch == " ") else " " for ch in text)


@lru_cache(maxsize=None)
def build_profiles(k: int = DEFAULT_K) -> dict[str, tuple[str, ...]]:
    """lang -> top-k trigrams by seed-corpus frequency (ties broken by
    trigram ascending — fully deterministic)."""
    out = {}
    for lang, passages in SEED_CORPUS.items():
        counts: dict[str, int] = {}
        for p in passages:
            norm = _normalize_py(p)
            for i in range(len(norm) - 2):
                t = norm[i : i + 3]
                counts[t] = counts.get(t, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[lang] = tuple(t for t, _ in top)
    return out


def profile_rows(k: int = DEFAULT_K) -> list[tuple[str, str, int]]:
    """Flat (trigram, lang, weight) rows, deterministic order.

    weight is discriminative and INTEGER: a trigram present in exactly one
    language's profile weighs ``NUM_LANGS``; present in all profiles it
    weighs 1 (``NUM_LANGS - n_langs + 1``). Integer scores sum exactly and
    order-independently in every engine, so the per-document argmax is
    bit-stable between Spark and DuckDB."""
    profs = build_profiles(k)
    nlangs: dict[str, int] = {}
    for tris in profs.values():
        for t in tris:
            nlangs[t] = nlangs.get(t, 0) + 1
    n = len(SEED_CORPUS)
    return [
        (tri, lang, n - nlangs[tri] + 1)
        for lang in sorted(SEED_CORPUS)
        for tri in profs[lang]
    ]


def trigrams(text) -> F.Column:
    """All length-3 substrings of the normalized text (empty array for
    texts shorter than one trigram)."""
    norm = F.lower(F.regexp_replace(text, NORM_PATTERN, " "))
    return F.when(
        F.length(norm) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - 2),
            lambda i: norm.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_lang_id_trigram(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    out: str = "lang_pred",
    k: int = DEFAULT_K,
    default: str = "und",
) -> DataFrame:
    """Label every row with its trigram-profile language.

    explode(trigrams) -> broadcast hash join with the profile table ->
    one map-side-partial min_by((-score, lang)) per document -> left
    join back (documents with zero profile hits -> ``default``)."""
    spark = df.sparkSession
    prof = F.broadcast(
        spark.createDataFrame(
            profile_rows(k), "tri string, plang string, w long"
        )
    )
    g = df.select(F.col(id_col), F.explode(trigrams(F.col(text_col))).alias("tri"))
    sc = g.join(prof, "tri").groupBy(id_col, "plang").agg(
        F.sum("w").alias("score")
    )
    best = sc.groupBy(id_col).agg(
        F.min_by(
            "plang", F.struct((-F.col("score")).alias("ns"), F.col("plang"))
        ).alias(out)
    )
    return df.join(best, id_col, "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(default))
    )


def oracle_sql(
    table: str,
    id_col: str,
    text_col: str = "text",
    k: int = DEFAULT_K,
    default: str = "und",
) -> str:
    """ANSI/DuckDB SQL computing the identical labeling (profile inlined
    as a VALUES table) — the driver-gate oracle for ``lang_id_trigram``."""
    values = ", ".join(
        f"('{tri}', '{lang}', {w})" for tri, lang, w in profile_rows(k)
    )
    return f"""
        WITH prof(tri, plang, w) AS (VALUES {values}),
        t AS (SELECT {id_col},
                     lower(regexp_replace({text_col}, '[^\\p{{L}} ]', ' ', 'g')) AS norm
              FROM {table}),
        g AS (SELECT {id_col},
                     unnest(list_transform(
                         generate_series(1, greatest(length(norm) - 2, 0)),
                         i -> substring(norm, CAST(i AS INTEGER), 3))) AS tri
              FROM t),
        sc AS (SELECT g.{id_col}, p.plang, sum(p.w) AS score
               FROM g JOIN prof p USING (tri) GROUP BY 1, 2),
        b AS (SELECT {id_col}, plang,
                     row_number() OVER (PARTITION BY {id_col}
                                        ORDER BY score DESC, plang ASC) AS rn
              FROM sc)
        SELECT d.{id_col}, coalesce(b.plang, '{default}') AS lang_pred
        FROM {table} d
        LEFT JOIN (SELECT {id_col}, plang FROM b WHERE rn = 1) b USING ({id_col})
    """
