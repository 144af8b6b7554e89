package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic language identification (SURVEY.md §2.B LLM-pipeline row:
  * "language filter"): stopword-profile scoring — the classic cheap
  * n-gram/stopword heuristic (van Noord's textcat lineage, public
  * literature), expressed entirely in codegen'd column functions.
  *
  * Each candidate language has a profile of high-frequency function
  * words; the document's score per language is the fraction of its
  * tokens found in that profile; argmax wins, with a confidence floor
  * below which the result is 'und' (undetermined).
  *
  * Map-only at any scale: no shuffle, no UDF, no state.
  */
object LangId {

  /** Top function words per language (public frequency lists). */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it",
      "was", "for", "on", "are", "with", "his", "they", "at", "be", "this"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no",
      "haber", "por", "con", "su", "para", "como", "estar", "los", "las"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit",
      "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une",
      "dans", "que", "qui", "pour", "pas", "sur", "au", "il", "plus", "par"),
    "it" -> Seq("il", "di", "che", "la", "per", "non", "con", "una", "sono",
      "mi", "si", "lo", "ma", "le", "gli", "del", "come", "questo", "della"))

  /** Per-language hit-ratio scores as a struct column over lowercased
    * whitespace/punctuation tokens. */
  def scores(text: Column): Column = {
    val ts = filter(split(lower(text), "[ ,.;:!?'\"]+"), t => t =!= "")
    val n = greatest(size(ts), lit(1)).cast("double")
    struct(Profiles.map { case (lang, words) =>
      (size(filter(ts, t => t.isin(words: _*))) / n).as(lang)
    }: _*)
  }

  /** Predicted language + confidence; 'und' below the floor. */
  def detect(text: Column, minConfidence: Double = 0.05): Column = {
    val sc = scores(text)
    val best = Profiles.map { case (lang, _) => sc.getField(lang) }
      .reduce((a, b) => greatest(a, b))
    val lang = Profiles.foldRight(lit("und")) { case ((l, _), acc) =>
      when(sc.getField(l) === best && best >= minConfidence, lit(l))
        .otherwise(acc)
    }
    struct(lang.as("lang"), round(best, 6).as("confidence"))
  }

  /** struct(lang, confidence) as a COLUMN via the native LangScores
    * expression — composable inline so callers (the curate pipeline)
    * add language without a self-join back onto the corpus: one scan,
    * map-only. Argmax/floor logic identical to `detect`. */
  def detectNative(text: Column, minConfidence: Double = 0.05): Column = {
    val sc = graft.functions.GraftFunctions
      .langScores(text, Profiles.map(_._2))
    val best = Profiles.indices.map(i => sc.getItem(i))
      .reduce((a, b) => greatest(a, b))
    val lang = Profiles.zipWithIndex.foldRight(lit("und")) {
      case (((l, _), i), acc) =>
        when(sc.getItem(i) === best && best >= minConfidence, lit(l))
          .otherwise(acc)
    }
    struct(lang.as("lang"), round(best, 6).as("confidence"))
  }

  /** (id, lang, confidence) for a corpus — scores via the native
    * LangScores expression (one token pass, hash-set probes; the HOF
    * `scores`/`detect` above are the reference form, parity-pinned in
    * PipelineSuite), argmax/floor logic identical. */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      minConfidence: Double = 0.05): DataFrame =
    docs.select(col(idCol).as("id"),
      detectNative(col(textCol), minConfidence).as("lp"))
      .select(col("id"), col("lp.lang").as("lang"),
        col("lp.confidence").as("confidence"))
}
