package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextKernels

/** Trained language identification over hashed char-n-gram features —
  * the real replacement for marker-word voting (q24): per-language
  * weight vectors (multinomial naive Bayes over [[TextKernels.md5Bucket]]
  * buckets) ride the plan as constants; ONE kernel walk scores every
  * language; argmax-with-margin is plain Column arithmetic. The
  * fastText-style shape (Joulin et al. 2017) at classifier scale: no
  * vocabulary table, no join, no shuffle — the corpus streams through a
  * projection at any size, exactly like q90's quality classifier.
  *
  * The built-in [[LangId.default]] model trains at first use (driver-
  * side, milliseconds) from [[LangId.seedCorpus]] — short common-topic
  * texts I composed for eight Latin-script languages; swap in a real
  * training corpus via [[LangId.train]] for production accuracy. The
  * md5 bucket hash is deliberately the PORTABLE form so the DuckDB
  * oracle (and any external trainer) replays bucket assignment exactly;
  * weights are 5-dp-scaled longs (exact integer sums, engine-portable).
  */
object LangId {

  /** One trained model: language codes (ascending), per-language
    * 5-dp-scaled NB log-prob weights (one long per bucket), gram size.
    */
  final case class Model(langs: Seq[String], scaled: Seq[Array[Long]],
                         n: Int) {
    require(langs == langs.sorted,
      "model languages must be ascending (deterministic argmax ties)")
    val nBuckets: Int = scaled.head.length
  }

  /** Seed texts (common-topic sentences, ~60 words per language) for the
    * built-in demo model. Original compositions over everyday vocabulary;
    * function words and inflection patterns carry the trigram signal.
    */
  val seedCorpus: Seq[(String, String)] = Seq(
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und die " +
      "kinder gehen heute morgen mit ihren freunden zur schule weil sie nicht " +
      "auf den bus warten wollen der immer zu spät kommt das wetter ist schön " +
      "und wir essen brot mit käse während die stadt langsam erwacht"),
    "en" -> ("the quick brown fox jumps over the lazy dog and the children are " +
      "walking to school with their friends this morning because they would " +
      "rather not wait for the bus which is always late the weather is lovely " +
      "and we are eating bread with cheese while the town slowly wakes up"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y los niños " +
      "van a la escuela esta mañana con sus amigos porque no quieren esperar " +
      "el autobús que siempre llega tarde el tiempo es hermoso y comemos pan " +
      "con queso mientras la ciudad despierta lentamente"),
    "fr" -> ("le renard brun rapide saute par dessus le chien paresseux et les " +
      "enfants vont à l'école ce matin avec leurs amis parce qu'ils ne veulent " +
      "pas attendre le bus qui est toujours en retard le temps est magnifique " +
      "et nous mangeons du pain avec du fromage pendant que la ville se réveille"),
    "it" -> ("la veloce volpe marrone salta sopra il cane pigro e i bambini " +
      "vanno a scuola questa mattina con i loro amici perché non vogliono " +
      "aspettare l'autobus che è sempre in ritardo il tempo è bellissimo e " +
      "mangiamo pane con formaggio mentre la città si sveglia lentamente"),
    "nl" -> ("de snelle bruine vos springt over de luie hond en de kinderen " +
      "lopen vanmorgen met hun vrienden naar school omdat ze niet willen " +
      "wachten op de bus die altijd te laat komt het weer is prachtig en we " +
      "eten brood met kaas terwijl de stad langzaam wakker wordt"),
    "pt" -> ("a rápida raposa marrom pula sobre o cão preguiçoso e as crianças " +
      "vão à escola esta manhã com os seus amigos porque não querem esperar o " +
      "autocarro que está sempre atrasado o tempo está lindo e comemos pão com " +
      "queijo enquanto a cidade acorda lentamente"),
    "sv" -> ("den snabba bruna räven hoppar över den lata hunden och barnen " +
      "går till skolan i morse med sina vänner eftersom de inte vill vänta på " +
      "bussen som alltid är försenad vädret är vackert och vi äter bröd med " +
      "ost medan staden långsamt vaknar"))

  /** Train a multinomial-NB model: per language, count lowercased char
    * n-gram bucket hits, weight(b) = ln((count(b)+1)/(total+nBuckets))
    * (add-one smoothing), rounded to 5 dp and scaled ×1e5 into longs.
    * Driver-side pure Scala — training corpora are model-sized, not
    * data-sized; scoring is where the cluster spends.
    */
  def train(corpus: Seq[(String, String)], nBuckets: Int = 1024,
            n: Int = 3): Model = {
    require(corpus.nonEmpty, "training corpus must be non-empty")
    require(nBuckets > 0, s"nBuckets must be > 0, got $nBuckets")
    val byLang = corpus.sortBy(_._1)
    val scaled = byLang.map { case (_, text) =>
      val s = text.toLowerCase(java.util.Locale.ROOT)
      val counts = new Array[Long](nBuckets)
      var total = 0L
      var i = 0
      val last = s.length - n
      while (i <= last) {
        counts(TextKernels.md5Bucket(s.substring(i, i + n), nBuckets)) += 1
        total += 1
        i += 1
      }
      require(total > 0, "a training text is shorter than one n-gram")
      Array.tabulate(nBuckets) { b =>
        val lnp = math.log((counts(b) + 1.0) / (total + nBuckets.toDouble))
        math.round(lnp * 1e5)
      }
    }
    Model(byLang.map(_._1), scaled, n)
  }

  /** The built-in eight-language demo model (trained once, lazily). */
  lazy val default: Model = train(seedCorpus)

  /** Model → the `graft_lang_scores` literal (`lang:w0,w1,…|lang2:…`). */
  def encode(m: Model): String =
    m.langs.zip(m.scaled).map { case (l, w) => l + ":" + w.mkString(",") }
      .mkString("|")

  /** Raw per-language score sums: [n_grams, sum_0, …, sum_L−1] (longs;
    * language order = `model.langs`). Requires
    * [[graft.functions.GraftFunctions.ensureRegistered]].
    */
  def scores(text: Column, model: Model = default): Column =
    call_function("graft_lang_scores", text, lit(encode(model)),
      lit(model.n))

  /** Language prediction columns over `textCol`: appends `lang_pred`
    * (argmax; ties → first language in ascending code order; "und" when
    * the text is shorter than one n-gram), `n_grams`, `score` (best
    * mean log-prob) and `margin` (best − runner-up, mean) — the
    * confidence gate a mix/census decision keys on. Pure codegen
    * projection + array arithmetic; zero shuffles at any corpus size.
    */
  def predict(df: DataFrame, textCol: String,
              model: Model = default): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val L = model.langs.length
    val arr = scores(col(textCol), model)
    val withArr = df.withColumn("__ls", arr)
    val nG = col("__ls").getItem(0)
    val sums = slice(col("__ls"), 2, L)
    val best = array_max(sums)
    val second = element_at(sort_array(sums, asc = false), 2)
    val langArr = array(model.langs.map(lit): _*)
    withArr
      .withColumn("lang_pred",
        when(nG === 0, lit("und"))
          .otherwise(element_at(langArr,
            array_position(sums, best).cast("int"))))
      .withColumn("n_grams", nG)
      .withColumn("score",
        when(nG > 0, best.cast("double") / lit(1e5) / nG))
      .withColumn("margin",
        when(nG > 0, (best - second).cast("double") / lit(1e5) / nG))
      .drop("__ls")
  }
}
