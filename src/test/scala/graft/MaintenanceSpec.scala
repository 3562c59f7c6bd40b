package graft

/** The e29/e30 maintenance loop's invariants — the facts the hash gates
  * can't state generically: plan rows obey the budget rules for ANY
  * occupancy shape, and execution moves exactly the planned members
  * (everyone else only relabels through the merge shift). */
class MaintenanceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val NCells = 16

  test("e29 plan rows obey the integer-exact budget rules") {
    val plan = LlmQueries.maintenancePlan(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val splits = plan.filter(_.getString(0) == "split")
    assert(splits.length <= 2, "split budget is 2 per window")
    splits.foreach { r =>
      assert(r.getLong(3) * NCells > total,
        s"split fired on a cell not above the mean: $r")
      assert(r.isNullAt(2), "split rows carry no cell_b")
    }
    val merges = plan.filter(_.getString(0) == "merge")
    assert(merges.length <= 1, "merge budget is 1 per window")
    merges.foreach { r =>
      assert(r.getLong(3) * NCells <= 2L * total,
        s"merged cell would break the split bound: $r")
      assert(r.getInt(1) < r.getInt(2), "merge pair is (smaller, larger)")
    }
  }

  test("e30 execution moves exactly the planned members") {
    val plan = LlmQueries.maintenancePlan(spark, dir).collect()
    val out = LlmQueries.maintenanceApply(spark, dir).collect()
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "an id appeared twice after maintenance")

    val occBefore = out.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    val occAfter = out.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    // execution numbers new cells in PLAN order: occupancy desc, cell asc
    val splitCells = plan.filter(_.getString(0) == "split")
      .sortBy(r => (-r.getLong(3), r.getInt(1).toLong)).map(_.getInt(1))
    val mergeOpt = plan.filter(_.getString(0) == "merge").headOption
      .map(r => (r.getInt(1), r.getInt(2)))
    def shift(c: Int): Int = mergeOpt match {
      case Some((a, b)) => if (c == b) a else if (c > b) c - 1 else c
      case None => c
    }
    val newCellOf = splitCells.zipWithIndex
      .map { case (c, i) => c -> (NCells + i) }.toMap
    val touched = splitCells.toSet ++
      mergeOpt.toList.flatMap { case (a, b) => List(a, b) }

    val nCellsAfter = NCells + splitCells.length - mergeOpt.size
    assert(out.map(_.getInt(2)).max < nCellsAfter, "cell id out of range")
    out.foreach { r =>
      val (cb, ca) = (r.getInt(1), r.getInt(2))
      if (!touched.contains(cb))
        assert(ca == shift(cb), s"unplanned member moved: $r")
      else if (splitCells.contains(cb))
        assert(ca == shift(cb) || ca == shift(newCellOf(cb)),
          s"split member landed outside its 2-means pair: $r")
      else // merge member
        assert(ca == mergeOpt.get._1, s"merged member missed the slot: $r")
    }
    // each planned split strictly relieved its cell; the merged slot
    // holds exactly the pair
    splitCells.foreach { c =>
      assert(occAfter.getOrElse(shift(c), 0) < occBefore(c),
        s"split left cell $c as full as before")
    }
    mergeOpt.foreach { case (a, b) =>
      assert(occAfter.getOrElse(a, 0) ==
        occBefore.getOrElse(a, 0) + occBefore.getOrElse(b, 0))
    }
  }
}
