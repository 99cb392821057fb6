package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Sq8Spec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, sf("embeddings"))

  test("encode: tinyint codes, max-|v| dimension saturates at ±127, zero vector is safe") {
    val enc = Sq8.encode(emb)
    assert(enc.schema("qvec").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.ByteType)
    // every vector's largest |code| is exactly 127 (the scale anchor)
    val anchors = enc.select(
      array_max(transform(col("qvec"), x => abs(x.cast("int")))).as("mx"))
      .groupBy("mx").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(anchors.keySet == Set(127), s"anchor codes: $anchors")

    import spark.implicits._
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val zr = Sq8.encode(z).head()
    assert(zr.getAs[Seq[Byte]]("qvec").forall(_ == 0) && zr.getDouble(2) == 0.0)
  }

  test("quantized cosine tracks float cosine within the rounding budget") {
    val enc = Sq8.encode(emb).filter(col("vec_id") < 200)
    val a = enc.select(col("vec_id").as("ida"), col("qvec").as("qa"), col("f").as("fa"))
    val b = enc.select(col("vec_id").as("idb"), col("qvec").as("qb"), col("f").as("fb"))
    val fl = emb.filter(col("vec_id") < 200)
    val fa = fl.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val fb = fl.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val err = a.join(b, col("ida") < col("idb"))
      .join(fa, Seq("ida")).join(fb, Seq("idb"))
      .select(abs(
        Sq8.cosineQ(col("qa"), col("fa"), col("qb"), col("fb")) -
          Ann.cosine(col("va"), col("vb"))).as("e"))
      .agg(max("e")).head().getDouble(0)
    assert(err < 0.02, s"max |cos_q - cos_float| = $err")
  }

  test("IVF-SQ8 vs plain IVF at the same probes: quantization loss under 5%") {
    val queries = emb.filter(col("vec_id") < 100)
    val index = Ivf.build(emb, nLists = 16)
    val exactProbe = Ivf.topK(index, queries, k = 5, nProbe = 4)
    val quantProbe = Sq8.topKIvf(index, queries, k = 5, nProbe = 4)
    val rel = Ann.recallAgainst(quantProbe, exactProbe)
      .head().getAs[Double]("recall_at_k")
    assert(rel >= 0.95, s"IVF-SQ8 relative recall = $rel")
  }

  test("persisted SQ8: save + overlapping ingest + replay searches like a one-shot encode") {
    val store = new graft.sources.ParquetStore(
      spark, java.nio.file.Files.createTempDirectory("sq8_store").toString)
    IndexStore.saveSq8(store, "s", emb.filter(col("vec_id") < 300), nShards = 8)
    IndexStore.appendSq8Batch(store, "s", emb.filter(col("vec_id") >= 250))
    IndexStore.appendSq8Batch(store, "s", emb.filter(col("vec_id") >= 250)) // replay
    val stored = IndexStore.loadSq8(store, "s")
    assert(stored.count() == emb.count()) // exactly once

    val queries = stored.filter(col("vec_id") < 20)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(canon(Sq8.topK(queries, stored, k = 5)) ==
      canon(Sq8.topK(Sq8.encode(emb).filter(col("vec_id") < 20),
        Sq8.encode(emb), k = 5)))
  }

  test("recall@5 against float brute force clears 0.95") {
    val queries = emb.filter(col("vec_id") < 100)
    val enc = Sq8.encode(emb)
    val recall = Ann.recallAgainst(
      Sq8.topK(enc.filter(col("vec_id") < 100), enc, k = 5),
      Ann.bruteForceTopK(queries, emb, k = 5))
      .head().getAs[Double]("recall_at_k")
    assert(recall >= 0.95, s"SQ8 recall@5 = $recall")
  }
}
