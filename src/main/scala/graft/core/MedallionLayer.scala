package graft.core

/** Medallion architecture label (reference `/root/reference/src/main/scala/
  * com/lakehouse/ingestion/core/MedallionLayer.scala:9-24`): bronze = raw
  * validated ingest, silver = deduped/conformed, gold = aggregated marts.
  */
sealed trait MedallionLayer {
  def name: String
}

object MedallionLayer {
  case object Bronze extends MedallionLayer { val name = "bronze" }
  case object Silver extends MedallionLayer { val name = "silver" }
  case object Gold   extends MedallionLayer { val name = "gold" }

  val all: Seq[MedallionLayer] = Seq(Bronze, Silver, Gold)

  def fromString(s: String): MedallionLayer =
    all.find(_.name == s.toLowerCase).getOrElse(
      throw new IllegalArgumentException(
        s"unknown layer '$s' (expected one of ${all.map(_.name).mkString("/")})"))
}
