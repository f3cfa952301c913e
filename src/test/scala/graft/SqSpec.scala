package graft

import org.apache.spark.sql.functions._

import graft.llm.{SimSearch, Sq}

class SqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.table(
    spark, "/root/testdata/sf0.001", "embeddings")

  test("stats finds exact per-dimension ranges") {
    val df = Seq(
      (1L, Seq(0.0f, -2.0f, 5.0f)),
      (2L, Seq(1.0f, 3.0f, 5.0f)),
      (3L, Seq(0.5f, 0.0f, 5.0f))).toDF("id", "v")
    val st = Sq.stats(df, "v")
    assert(st.dim == 3)
    assert(st.mins.toSeq == Seq(0.0, -2.0, 5.0))
    assert(st.maxs.toSeq == Seq(1.0, 3.0, 5.0))
  }

  test("codes: min -> 0, max -> 255, degenerate dim -> 0, " +
    "midpoints land proportionally") {
    val df = Seq(
      (1L, Seq(0.0f, -2.0f, 5.0f)),
      (2L, Seq(1.0f, 3.0f, 5.0f)),
      (3L, Seq(0.5f, 0.0f, 5.0f))).toDF("id", "v")
    val st = Sq.stats(df, "v")
    val codes = Sq.encode(df, "id", "v", st)
      .orderBy("id").select("code").as[Seq[Int]].collect()
    assert(codes(0) == Seq(0, 0, 0))      // mins (and degenerate dim 3)
    assert(codes(1) == Seq(255, 255, 0))  // maxes
    // 0.5 of [0,1] -> floor(0.5*255)=127; 0.0 of [-2,3] -> floor(2/5*255)=102
    assert(codes(2) == Seq(127, 102, 0))
    // every code in [0, 255]
    val all = Sq.encode(emb, "vec_id", "embedding",
      Sq.stats(emb, "embedding"))
      .select(explode(col("code")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(all.getInt(0) >= 0 && all.getInt(1) <= 255)
  }

  test("corpus replication leaves stats — and therefore codes — " +
    "exactly unchanged (min/max are idempotent under duplication)") {
    val st1 = Sq.stats(emb, "embedding")
    val st2 = Sq.stats(emb.union(emb).union(emb), "embedding")
    assert(st1.mins.toSeq == st2.mins.toSeq &&
      st1.maxs.toSeq == st2.maxs.toSeq)
  }

  test("encode is layout-independent (repartition invariance)") {
    val st = Sq.stats(emb, "embedding")
    val a = Sq.encode(emb, "vec_id", "embedding", st)
      .orderBy("id").select("id", "code").as[(Long, Seq[Int])].collect()
    val b = Sq.encode(emb.repartition(13), "vec_id", "embedding", st)
      .orderBy("id").select("id", "code").as[(Long, Seq[Int])].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("adcTopK ranks 1..k per query and approximates brute-force L2") {
    val st = Sq.stats(emb, "embedding")
    val queries = emb.filter(col("vec_id") < 5)
    val got = Sq.adcTopK(emb, queries, "vec_id", "embedding", st, k = 5)
    val ranks = got.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .select("n", "mx").as[(Long, Int)].collect()
    assert(ranks.forall { case (n, mx) => n == 5 && mx == 5 })
    // SQ8 decode error is tiny relative to inter-point distances:
    // top-5 sets should overlap heavily with exact cosine-free L2 ranks
    val exactTop = SimSearch.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val sqTop = got.select("query_id", "nbr_id")
      .as[(Long, Long)].collect().toSet
    // brute force ranks by cosine, SQ by L2 — on this data the top
    // sets still overlap; require a loose floor to pin "approximates"
    val overlap = (exactTop intersect sqTop).size.toDouble / exactTop.size
    assert(overlap >= 0.2, s"overlap $overlap")
  }

  test("adc distance of a vector to itself's codes is near zero " +
    "and below distance to other vectors") {
    val st = Sq.stats(emb, "embedding")
    // include self by NOT filtering query_id != id: use a shifted id
    val q = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val got = Sq.adcTopK(emb, q, "vec_id", "embedding", st, k = 1)
      .select("nbr_id", "adc_dist").as[(Long, Double)].head()
    assert(got._1 == 7L, s"nearest to own codes should be itself: $got")
    assert(got._2 < 0.01, s"self ADC distance should be ~0: ${got._2}")
  }

  test("SqEncode kernel == the HOF executable spec (incl. NaN, " +
    "out-of-range clamps, degenerate dims) and AdcSum == the HOF " +
    "fold, corpus-wide") {
    val emb = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "embeddings")
    val st = Sq.stats(emb, "embedding")
    def hofCode(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val mnL = typedLit(st.mins.toSeq)
      val mxL = typedLit(st.maxs.toSeq)
      val top = lit((st.levels - 1).toDouble)
      transform(sequence(lit(0), lit(st.dim - 1)), i => {
        val mn = element_at(mnL, i + 1)
        val mx = element_at(mxL, i + 1)
        val x = element_at(vec.cast("array<double>"), i + 1)
        when(mx === mn, lit(0)).otherwise(
          least(lit(st.levels - 1), greatest(lit(0),
            floor(((x - mn) * top) / (mx - mn)).cast("int"))))
      })
    }
    val badC = emb.select(
      Sq.codeColumn(col("embedding"), st).as("k"),
      hofCode(col("embedding")).as("h"))
      .filter(not(col("k") <=> col("h"))).count()
    assert(badC == 0L, s"$badC vectors encode differently")
    // out-of-corpus values exercise the clamps; NaN floors to 0. The
    // kernel SATURATES here where the HOF spec is unrunnable: its
    // clamp sat OUTSIDE the long->int cast, so a far-out-of-range
    // value overflowed the cast (ANSI CAST_OVERFLOW) before greatest/
    // least ever saw it — encoding yesterday's stats against a wild
    // new crawl vector crashed instead of clamping
    val wild = Seq(
      Seq(1e12, -1e12, Double.NaN) ++ Seq.fill(st.dim - 3)(0.5))
      .toDF("embedding")
      .select(col("embedding").cast("array<double>").as("embedding"))
    val w = wild.select(Sq.codeColumn(col("embedding"), st).as("k"))
      .as[Seq[Int]].head()
    assert(w(0) == st.levels - 1 && w(1) == 0 && w(2) == 0,
      s"wild-value clamps: ${w.take(3)}")
    assert(w.forall(c => c >= 0 && c < st.levels))
    // AdcSum vs the HOF fold over a real dtab/code pair set
    val codes = Sq.encode(emb, "vec_id", "embedding", st)
    val q = emb.limit(3)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val top = (st.levels - 1).toDouble
    val qdf = q.toSeq.map { case (qid, qv) =>
      val dtab = (0 until st.dim).map { i =>
        val step = (st.maxs(i) - st.mins(i)) / top
        (0 until st.levels).map { c =>
          val diff = qv(i) - (st.mins(i) + c * step); diff * diff
        }
      }
      (qid, dtab)
    }.toDF("query_id", "dtab")
    val badA = codes.crossJoin(broadcast(qdf)).select(
      graft.functions.AdcSum(col("dtab"), col("code")).as("k"),
      aggregate(sequence(lit(0), lit(st.dim - 1)), lit(0.0),
        (acc, i) => acc + element_at(element_at(col("dtab"), i + 1),
          element_at(col("code"), i + 1) + 1)).as("h"))
      .filter(not(col("k") <=> col("h"))).count()
    assert(badA == 0L, s"$badA ADC sums differ")
  }

  test("stats refuses a mixed-dimension corpus (per-dimension counts " +
    "differ) — posexplode positions are always dense, so the old " +
    "position-range check was a tautology and short vectors' pad codes " +
    "would rank by phantom minimum coordinates") {
    val mixed = Seq(
      (1L, Array(0.0, 1.0, 2.0)),
      (2L, Array(0.0, 1.0, 2.0, 3.0, 4.0))).toDF("id", "v")
    val ex = intercept[IllegalArgumentException](
      graft.llm.Sq.stats(mixed, "v"))
    assert(ex.getMessage.contains("ragged"), ex.getMessage)
  }
}
