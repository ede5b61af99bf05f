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
    def dirs(): Set[String] = sc.getCheckpointDir.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(sc.hadoopConfiguration)
      if (fs.exists(p)) fs.listStatus(p).map(_.getPath.toString).toSet
      else Set.empty[String]
    }.getOrElse(Set.empty)
    val before = dirs()
    val m = Materialize(df, MatStrategy.Reliable)
    assert(m.df.count() == 3)
    val created = dirs().diff(before)
    assert(created.nonEmpty, "checkpoint files must exist")
    m.release()
    // only THIS materialization's dirs must be gone — other suites may
    // legitimately have live checkpoints in the shared session root
    assert(dirs().intersect(created).isEmpty,
      "release must delete the rdd checkpoint dirs it created")
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

  test("reapDefaultSpills deletes unreleased Default spill dirs; " +
    "released handles are not double-tracked") {
    Materialize.reapDefaultSpills(spark) // drain anything left by peers
    val m1 = Materialize(df, MatStrategy.Default) // leaked on purpose
    val m2 = Materialize(df, MatStrategy.Default)
    m2.release() // properly released → deregistered
    assert(m1.df.count() == df.count())
    assert(Materialize.reapDefaultSpills(spark) == 1,
      "exactly the one unreleased dir must be reaped")
    assert(Materialize.reapDefaultSpills(spark) == 0, "reap is idempotent")
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
