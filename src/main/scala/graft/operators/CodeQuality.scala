package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-corpus curation (The Stack / StarCoder filter family): the
  * per-file signals a code pretraining pipeline gates on, plus
  * license detection — SPDX identifier extraction with a phrase
  * heuristic fallback for the big license families.
  *
  * All signals are INTEGERS and every threshold is an integer
  * comparison (alpha fraction >= 1/4 is `alpha_chars * 4 >=
  * total_chars`), so an oracle replays each keep/drop verdict with
  * no float tolerance. Built from codegen'd Spark builtins (split /
  * transform / regexp_replace) — a pure map, zero shuffles; streams
  * score exactly like batches. */
object CodeQuality {

  /** The gate thresholds (StarCoder-ish): max line 1000 chars, mean
    * line <= 100 chars, >= 25% alphabetic, not auto-generated. */
  def signals(docs: DataFrame, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    docs
      .withColumn("n_lines", size(lines))
      .withColumn("max_line_len",
        array_max(transform(lines, l => length(l))))
      .withColumn("total_chars", length(col(textCol)))
      .withColumn("alpha_chars",
        length(regexp_replace(col(textCol), "[^A-Za-z]", "")))
      .withColumn("digit_chars",
        length(regexp_replace(col(textCol), "[^0-9]", "")))
      .withColumn("autogen",
        lower(col(textCol)).contains("auto-generated") ||
          lower(col(textCol)).contains("do not edit"))
      .withColumn("keep",
        col("max_line_len") <= 1000 &&
          col("total_chars") <= col("n_lines") * 100 &&
          col("alpha_chars") * 4 >= col("total_chars") &&
          !col("autogen"))
  }

  /** SPDX-License-Identifier wins; otherwise the phrase heuristics
    * every license scanner starts from. Null = undetected (the
    * "needs human review" bucket a code pipeline quarantines). */
  def licenseOf(c: Column): Column = {
    val spdx = regexp_extract(c,
      "SPDX-License-Identifier:\\s*([A-Za-z0-9.+\\-]+)", 1)
    when(spdx =!= "", spdx)
      .when(c.contains("Apache License"), lit("Apache-2.0"))
      .when(lower(c).contains("permission is hereby granted, free of charge")
        .or(c.contains("MIT License")), lit("MIT"))
      .when(c.contains("GNU General Public License"), lit("GPL"))
      .when(c.contains("Redistribution and use in source and binary forms"),
        lit("BSD"))
      .otherwise(lit(null))
  }
}
