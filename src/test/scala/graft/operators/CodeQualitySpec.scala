package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Code-corpus curation: signal values against hand-computed files,
  * each gate condition independently violated, and the license
  * detector across SPDX, phrase-heuristic, and undetected files. */
class CodeQualitySpec extends SparkTestBase {
  import spark.implicits._

  test("signals on a hand-built file are exact") {
    val code = "int main() {\n  return 42;\n}\n"
    val df = CodeQuality.signals(Seq((1L, code)).toDF("doc_id", "text"),
      "text")
    val r = df.collect()(0)
    // lines: "int main() {", "  return 42;", "}", ""
    assert(r.getAs[Int]("n_lines") == 4)
    assert(r.getAs[Int]("max_line_len") == 12)
    assert(r.getAs[Int]("total_chars") == code.length)
    assert(r.getAs[Int]("alpha_chars") == "intmainreturn".length)
    assert(r.getAs[Int]("digit_chars") == 2)
    assert(!r.getAs[Boolean]("autogen"))
    assert(r.getAs[Boolean]("keep"))
  }

  test("each gate condition drops independently") {
    val good = "def f(x):\n  return x\n"
    val longLine = "x = 1\n" + "a" * 1001 + "\n"
    val dataFile = (0 until 50).map(_ => "0123456789,0xff,===").mkString("\n")
    val generated = "// AUTO-GENERATED; DO NOT EDIT\nint x;\n"
    val generated2 = "# this file is auto-generated\nx = 1\n"
    val df = CodeQuality.signals(Seq(
      (0L, good), (1L, longLine), (2L, dataFile), (3L, generated),
      (4L, generated2)).toDF("doc_id", "text"), "text")
    val keep = df.collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(keep == Map(0L -> true, 1L -> false, 2L -> false,
      3L -> false, 4L -> false))
  }

  test("license detection: SPDX wins, phrase heuristics fall back, " +
    "unknown is null") {
    val cases = Seq(
      ("// SPDX-License-Identifier: BSD-3-Clause\ncode",
        "BSD-3-Clause"),
      ("/* SPDX-License-Identifier: GPL-3.0-or-later */",
        "GPL-3.0-or-later"),
      ("Licensed under the Apache License, Version 2.0", "Apache-2.0"),
      ("Permission is hereby granted, free of charge, to any person",
        "MIT"),
      ("This file is part of Foo.\nGNU General Public License terms",
        "GPL"),
      ("Redistribution and use in source and binary forms, with or " +
        "without modification", "BSD"),
      ("just some code with no license at all", null))
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) =>
      (i.toLong, t)
    }.toDF("doc_id", "text")
      .select(col("doc_id"), CodeQuality.licenseOf(col("text"))
        .as("license"))
    val got = df.collect().sortBy(_.getLong(0))
      .map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(got.toSeq == cases.map(_._2))
  }

  test("the plan is a pure map: no shuffle, no UDF objects") {
    val df = CodeQuality.signals(
      Seq((1L, "x\ny")).toDF("doc_id", "text"), "text")
      .select(col("doc_id"), col("keep"),
        CodeQuality.licenseOf(col("text")).as("license"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") &&
      !plan.contains("SerializeFromObject"), plan)
  }
}
