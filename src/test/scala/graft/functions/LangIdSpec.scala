package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hashed char-n-gram language classifier: parity of the native
  * expressions against their builtins spellings, and the accuracy
  * demonstration the fixture cannot provide — the synthetic documents
  * table draws every language's text from one shared vocabulary (lang
  * is a label, not a property of the text), so q_lang_id_hashed's
  * fixture accuracy is chance BY CONSTRUCTION; here the same training
  * shape separates genuinely multilingual sentences.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("char_ngrams == builtins substr windows (code points, incl. non-BMP)") {
    val rows = Seq("", "a", "ab", "abc", "abcd", "héllo wörld",
      "日本語のテキスト", "😀ab😀cd", "a😀", "mixed 中文 text")
    val got = rows.toDF("t")
      .select(col("t"),
        GraftFunctions.char_ngrams(col("t"), 3).as("mine"),
        when(length(col("t")) < 3, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(col("t")) - 2),
            i => col("t").substr(i, lit(3)))).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"ngram mismatch on '${r.getString(0)}'")
    }
  }

  test("hashed_weight_sums + lang_bucket_counts == builtins wide-bucket spelling") {
    val dim = 64
    val t1 = (0 until dim).map(i => (i * 7 + 1).toLong)
    val t2 = (0 until dim).map(i => (i * 3 - 50).toLong)
    // the two-byte md5 bucket, spelled with builtins exactly as the
    // q_lang_id_hashed oracle spells it in DuckDB
    def bucket(g: org.apache.spark.sql.Column) = {
      def a(k: Int) = ascii(substring(md5(g.cast("binary")), k, 1))
      ((a(1) * 16 + a(2)) * 256 + a(3) * 16 + a(4)) % dim
    }
    def refSum(t: Seq[Long]) = (ws: org.apache.spark.sql.Column) =>
      aggregate(transform(ws, g => element_at(typedLit(t), (bucket(g) + 1).cast("int"))),
        lit(0L), (acc, x) => acc + x)
    val df = Seq(Seq("the", "quick", "brown", "fox"), Seq("日本", "語"),
      Seq.empty[String]).toDF("ws")
    val got = df.select(
      GraftFunctions.hashed_weight_sums(col("ws"), Seq(t1, t2)).as("m"),
      refSum(t1)(col("ws")).as("r1"),
      refSum(t2)(col("ws")).as("r2"),
      GraftFunctions.lang_bucket_counts(col("ws"), dim).as("bc"),
      aggregate(transform(col("ws"), g => bucket(g).cast("int")),
        typedLit(Seq.fill(dim)(0L)),
        (acc, b) => transform(acc, (v, i) => when(i === b, v + 1).otherwise(v)))
        .as("rbc")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == Seq(r.getLong(1), r.getLong(2)))
      assert(r.getSeq[Long](3) == r.getSeq[Long](4), "bucket counts diverge")
    }
  }

  test("real multilingual text: the trained classifier separates 5 languages") {
    // genuinely distinct-language sentences (public pangram/common-text
    // shapes), 8 per language: 6 train / 2 held out
    val corpus = Seq(
      "en" -> Seq(
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she sells sea shells by the sea shore every sunny morning",
        "a journey of a thousand miles begins with a single step forward",
        "reading books in the library is the best way to spend an afternoon",
        "the weather forecast says it will rain heavily throughout the week",
        "children love playing football in the park after school hours",
        "this sentence is written in plain simple everyday english words",
        "the train arrives at the central station at nine in the morning"),
      "es" -> Seq(
        "el rápido zorro marrón salta sobre el perro perezoso junto al río",
        "ella vende conchas de mar en la orilla cada mañana soleada",
        "un viaje de mil millas comienza con un solo paso adelante",
        "leer libros en la biblioteca es la mejor manera de pasar la tarde",
        "el pronóstico dice que lloverá mucho durante toda la semana",
        "a los niños les encanta jugar al fútbol en el parque después de clase",
        "esta oración está escrita en palabras españolas sencillas de cada día",
        "el tren llega a la estación central a las nueve de la mañana"),
      "de" -> Seq(
        "der schnelle braune fuchs springt über den faulen hund am flussufer",
        "sie verkauft muscheln am meeresufer an jedem sonnigen morgen",
        "eine reise von tausend meilen beginnt mit einem einzigen schritt",
        "bücher in der bibliothek zu lesen ist die beste art den nachmittag zu verbringen",
        "die wettervorhersage sagt starken regen für die ganze woche voraus",
        "kinder spielen gern fußball im park nach der schule",
        "dieser satz ist in einfachen deutschen alltagswörtern geschrieben",
        "der zug kommt um neun uhr morgens am hauptbahnhof an"),
      "fr" -> Seq(
        "le rapide renard brun saute par dessus le chien paresseux près de la rivière",
        "elle vend des coquillages au bord de la mer chaque matin ensoleillé",
        "un voyage de mille lieues commence par un seul premier pas",
        "lire des livres à la bibliothèque est la meilleure façon de passer l'après-midi",
        "la météo annonce de fortes pluies pendant toute la semaine",
        "les enfants adorent jouer au football dans le parc après l'école",
        "cette phrase est écrite avec des mots français simples de tous les jours",
        "le train arrive à la gare centrale à neuf heures du matin"),
      "zh" -> Seq(
        "敏捷的棕色狐狸跳过了河边那只懒惰的狗",
        "她每个晴朗的早晨都在海边卖贝壳",
        "千里之行始于足下每一步都很重要",
        "在图书馆读书是度过下午最好的方式",
        "天气预报说这一周都会下大雨",
        "孩子们放学后喜欢在公园里踢足球",
        "他每天早晨都在公园里读书看报纸",
        "这本书是用简单的日常中文词语写成的"))
    val rows = corpus.flatMap { case (l, ss) =>
      ss.zipWithIndex.map { case (s, i) => (l, s, i >= 6) }
    }
    val df = rows.toDF("lang", "text", "held")
    val model = graft.ops.TextOps.trainLangIdModel(df.filter(!col("held")))
    assert(model.map(_._1) == Seq("de", "en", "es", "fr", "zh"))
    val scored = graft.ops.TextOps.langIdScore(
      df.filter(col("held")).withColumn("doc_id", monotonically_increasing_id()),
      model).collect()
    val correct = scored.count(r => r.getString(1) == r.getString(2))
    assert(correct >= 9,
      s"expected >= 9/10 held-out sentences classified correctly, got $correct: " +
        scored.map(r => s"${r.getString(1)}->${r.getString(2)}").mkString(", "))
  }
}
