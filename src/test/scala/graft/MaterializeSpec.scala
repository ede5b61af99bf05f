package graft

import org.apache.spark.sql.functions._

import graft.ops.{MatStrategy, Materialize}

class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")

  test("Local materializes eagerly and release frees every block") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val m = Materialize(df, MatStrategy.Local)
    assert(m.df.count() == 3)
    assert(sc.getPersistentRDDs.keySet.diff(before).nonEmpty,
      "localCheckpoint should register blocks")
    m.release()
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty,
      "release must unpersist exactly the blocks it created")
  }

  test("Reliable checkpoints to the checkpoint dir and release deletes it") {
    val sc = spark.sparkContext
    val m = Materialize(df, MatStrategy.Reliable)
    assert(m.df.count() == 3)
    val ckptDir = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
    val fs = ckptDir.getFileSystem(sc.hadoopConfiguration)
    assert(fs.listStatus(ckptDir).nonEmpty, "checkpoint files must exist")
    // reliable checkpoint leaves no persistent RDD blocks behind
    m.release()
    assert(fs.listStatus(ckptDir).isEmpty,
      "release must delete the rdd checkpoint dirs")
  }

  test("Spill round-trips rows+schema through parquet; release deletes files") {
    val root = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val src = df.withColumn("d", col("id").cast("double"))
    val m = Materialize(src, MatStrategy.Spill(root))
    // parquet reads relax nullability — names and types must survive
    assert(m.df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(m.df.orderBy("id").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
    m.release()
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(p).isEmpty, "release must delete the spill dir")
  }

  test("Spill of an EMPTY frame keeps the schema (explicit-schema read)") {
    val root = java.nio.file.Files.createTempDirectory("graft_mat_e").toString
    val empty = df.where(lit(false))
    val m = Materialize(empty, MatStrategy.Spill(root))
    assert(m.df.count() == 0)
    assert(m.df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      empty.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    m.release()
  }
}
