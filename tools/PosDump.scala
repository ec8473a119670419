package graft.tools

import graft.ml.{PosLexicon, PosTagger, PosTransitions}

/** Scratch: dump every POS model table as JSON for offline threshold
  * sweeps (the suffix-table prototype). Not part of the library. */
object PosDump {
  def main(args: Array[String]): Unit = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def sj(xs: Iterable[String]) = xs.map(s => "\"" + esc(s) + "\"").mkString("[", ",", "]")
    val sb = new StringBuilder("{")
    sb ++= "\"closed\":" + PosTagger.Lexicon.toSeq.sorted.map { case (w, t) =>
      s"""["${esc(w)}","$t"]""" }.mkString("[", ",", "]")
    sb ++= ",\"lexicon\":" + PosLexicon.Entries.map { case (w, t) =>
      s"""["${esc(w)}","$t"]""" }.mkString("[", ",", "]")
    sb ++= ",\"suffix_rules\":" + PosTagger.SuffixRules.map { case (s, t) =>
      s"""["$s","$t"]""" }.mkString("[", ",", "]")
    sb ++= ",\"transitions\":" + PosTransitions.Transitions.map { case (s, t, c) =>
      s"""["${esc(s)}","$t",$c]""" }.mkString("[", ",", "]")
    sb ++= ",\"ambiguity\":" + PosTransitions.Ambiguity.map { case (w, ta, ca, tb, cb) =>
      s"""["${esc(w)}","$ta",$ca,"$tb",$cb]""" }.mkString("[", ",", "]")
    sb ++= ",\"tag_totals\":" + PosTransitions.TagTotals.map { case (t, c) =>
      s"""["$t",$c]""" }.mkString("[", ",", "]")
    sb ++= ",\"state_words\":" + sj(PosTransitions.StateWords)
    sb ++= ",\"emission\":" + PosTransitions.Emission.map { case (w, t) =>
      s"""["${esc(w)}","$t"]""" }.mkString("[", ",", "]")
    sb ++= "}"
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/pos_model.json"),
      sb.toString.getBytes("UTF-8"))
    println("wrote /tmp/pos_model.json")
  }
}
