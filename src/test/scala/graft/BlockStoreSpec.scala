package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.store.{BlockStore, Store}

/** The shared block-partial machinery: for ANY (seeded-random)
  * interleaving of block writes, replays, and compactions at arbitrary
  * cut points, the merged read equals the one-shot union of the final
  * committed batches — the invariant all three streaming MVs lean on. */
class BlockStoreSpec extends SparkSpec {

  private def writeBlock(partials: String, blockId: Long,
                         rows: Seq[Long]): Unit = {
    import spark.implicits._
    Store.swapDirectory(partials, s"block=$blockId") { tmp =>
      rows.toDF("v").coalesce(1).write.mode("overwrite").parquet(tmp)
    }
  }

  private def mergedRows(partials: String): Seq[Long] =
    spark.read.parquet(partials).select("v")
      .collect().map(_.getLong(0)).toSeq.sorted

  test("random interleavings of write/replay/compact always read back " +
    "the one-shot union (seeded)") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val partials = tmpDir(s"bs-prop-$trial")
      val nBatches = 4 + rnd.nextInt(4)
      // batch i carries rows [i*100, i*100 + len)
      val batches = (0 until nBatches).map { i =>
        i.toLong -> (0 until (1 + rnd.nextInt(5)))
          .map(j => i * 100L + j)
      }.toMap
      var delivered = List.empty[Long]
      batches.toSeq.sortBy(_._1).foreach { case (id, rows) =>
        writeBlock(partials, id, rows)
        delivered ::= id
        // at-least-once: maybe replay the newest committed batch
        if (rnd.nextBoolean()) writeBlock(partials, id, rows)
        // maybe compact through a random already-committed point
        if (rnd.nextBoolean() && delivered.size > 1) {
          val cut = delivered(rnd.nextInt(delivered.size))
          BlockStore.compact(spark, partials, cut)(_.select("v"))
        }
      }
      val expect = batches.values.flatten.toSeq.sorted
      assert(mergedRows(partials) == expect,
        s"trial $trial: merged read diverged from one-shot union")
    }
  }

  test("compact is a no-op with fewer than two foldable blocks and " +
    "idempotent after a fold") {
    val partials = tmpDir("bs-idem")
    writeBlock(partials, 0L, Seq(1L, 2L))
    BlockStore.compact(spark, partials, 0L)(_.select("v")) // 1 block: no-op
    assert(mergedRows(partials) == Seq(1L, 2L))
    writeBlock(partials, 1L, Seq(3L))
    writeBlock(partials, 2L, Seq(4L))
    BlockStore.compact(spark, partials, 1L)(_.select("v"))
    val once = mergedRows(partials)
    BlockStore.compact(spark, partials, 1L)(_.select("v")) // nothing left
    assert(mergedRows(partials) == once && once == Seq(1L, 2L, 3L, 4L))
  }

  test("a stale staging dir from a crashed compaction cannot leak its " +
    "content into the next swap") {
    val partials = tmpDir("bs-crash")
    writeBlock(partials, 0L, Seq(1L))
    writeBlock(partials, 1L, Seq(2L))
    writeBlock(partials, 2L, Seq(3L))

    // simulate a compaction that died AFTER staging began: a populated
    // .stage_<name> dir holding a dead attempt's folded block with
    // rows that were since superseded — if the next swap doesn't
    // pre-clean, this block would ride into the live store
    val p = Paths.get(partials)
    val stage = p.getParent.resolve(".stage_" + p.getFileName.toString)
    Files.createDirectories(stage)
    import spark.implicits._
    Seq(999L).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(stage.resolve("block=7").toString)

    BlockStore.compact(spark, partials, 1L)(_.select("v"))
    assert(mergedRows(partials) == Seq(1L, 2L, 3L),
      "stale staging content leaked into the live store")
  }

  test("expire retires old blocks, and a replayed expired block cannot " +
    "resurrect through the sink path") {
    val partials = tmpDir("bs-expire")
    (0L to 3L).foreach(i => writeBlock(partials, i, Seq(i * 10, i * 10 + 1)))
    BlockStore.expire(partials, beforeBlockId = 2L)
    assert(mergedRows(partials) == Seq(20L, 21L, 30L, 31L),
      "expire did not retire blocks below the watermark")
    // TTL's point at the store level: the bytes are GONE, not filtered
    assert(!Files.exists(Paths.get(partials, "block=0")) &&
      !Files.exists(Paths.get(partials, "block=1")))
    // an at-least-once replay of a retired batch is dropped, not rewritten
    val wrote = BlockStore.writeBlock(partials, 1L) { tmp =>
      import spark.implicits._
      Seq(999L).toDF("v").coalesce(1).write.mode("overwrite").parquet(tmp)
    }
    assert(!wrote, "writeBlock accepted a block below the expiry watermark")
    assert(mergedRows(partials) == Seq(20L, 21L, 30L, 31L),
      "a replayed expired block resurrected its rows")
    // even a dir that reappears under the watermark (torn window) is
    // invisible to reads
    writeBlock(partials, 0L, Seq(777L)) // raw swap, bypassing the guard
    assert(mergedRows2(partials) == Seq(20L, 21L, 30L, 31L),
      "watermark-filtered read exposed a retired block dir")
  }

  test("expire watermark survives compaction and stays monotone") {
    val partials = tmpDir("bs-expire-compact")
    (0L to 4L).foreach(i => writeBlock(partials, i, Seq(i)))
    BlockStore.expire(partials, beforeBlockId = 1L)
    BlockStore.compact(spark, partials, 3L)(_.select("v"))
    assert(BlockStore.watermark(Paths.get(partials)) == 1L,
      "compaction dropped the expiry watermark")
    // an older expire call must not move the watermark backwards
    BlockStore.expire(partials, beforeBlockId = 0L)
    assert(BlockStore.watermark(Paths.get(partials)) == 1L,
      "expire moved the watermark backwards")
    assert(mergedRows(partials) == Seq(1L, 2L, 3L, 4L))
    // expiring INTO folded history retires the folded block as a unit
    BlockStore.expire(partials, beforeBlockId = 4L)
    assert(mergedRows(partials) == Seq(4L))
  }

  test("a block committed WHILE compaction stages is captured by the " +
    "swap, not lost; absorbed blocks are not double-counted") {
    val partials = tmpDir("bs-late")
    (0L to 2L).foreach(i => writeBlock(partials, i, Seq(i)))
    // the fold callback runs INSIDE the staging step, before the rename
    // pair — committing block 9 from it simulates a sink whose
    // micro-batch lands in the window between the initial listing and
    // the swap (the lost-new-commit race)
    BlockStore.compact(spark, partials, 1L) { df =>
      writeBlock(partials, 9L, Seq(99L))
      df.select("v")
    }
    assert(mergedRows(partials) == Seq(0L, 1L, 2L, 99L),
      "a block committed during staging was lost by the swap " +
        "or an absorbed block was double-counted")
  }

  test("copyRecursively clears a partially-copied destination on " +
    "retry-like reuse instead of merging two source versions") {
    import spark.implicits._
    val root = Paths.get(tmpDir("bs-copy"))
    val srcA = root.resolve("a"); val srcB = root.resolve("b")
    Seq(1L).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(srcA.toString)
    Seq(2L, 3L).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(srcB.toString)
    val dst = root.resolve("dst")
    BlockStore.copyRecursively(srcA, dst)
    // second copy to the SAME dst (what a retry does after a partial
    // first attempt): must replace wholesale — part-files have distinct
    // names across versions, so a merge would double the rows, and the
    // root-dir copy would throw DirectoryNotEmptyException un-cleared
    BlockStore.copyRecursively(srcB, dst)
    val got = spark.read.parquet(dst.toString)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(2L, 3L),
      s"destination holds $got — stale first-copy content survived")
  }

  test("read of a store with no committed block returns an explicit-" +
    "schema empty frame, not an inference error") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("v", LongType)))
    // root does not exist at all
    val ghost = s"${tmpDir("bs-empty")}/never-created"
    assert(BlockStore.read(spark, ghost, schema).count() == 0L)
    // root exists but holds no block (first commit still in flight)
    val bare = tmpDir("bs-bare")
    assert(BlockStore.read(spark, bare, schema).count() == 0L)
    assert(BlockStore.read(spark, bare, schema).schema == schema)
  }

  /** Merge-on-read through the watermark-aware path (BlockStore.read),
    * for the torn-window assertion above; [[mergedRows]] reads the raw
    * root and deliberately sees whatever dirs exist. */
  private def mergedRows2(partials: String): Seq[Long] = {
    import org.apache.spark.sql.types._
    BlockStore.read(spark, partials,
      StructType(Seq(StructField("v", LongType))))
      .select("v").collect().map(_.getLong(0)).toSeq.sorted
  }

  test("two concurrent compact runners: exactly one wins the " +
    "maintenance lease, the other fails fast, no data loss") {
    val partials = tmpDir("bs-lease-race") + "/store"
    (0L to 3L).foreach(i => writeBlock(partials, i, Seq(i * 10, i * 10 + 1)))
    val expect = mergedRows(partials)

    // both runners release from one latch so their acquire attempts
    // overlap; the winner's fold then WAITS for the loser's fail-fast,
    // pinning that the loser was rejected while the lease was held —
    // not merely serialized after a completed run
    val start = new java.util.concurrent.CountDownLatch(2)
    val loserFailed = new java.util.concurrent.CountDownLatch(1)
    val outcomes =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        start.countDown(); start.await()
        try {
          BlockStore.compact(spark, partials, throughBlockId = 3L) { df =>
            loserFailed.await(30, java.util.concurrent.TimeUnit.SECONDS)
            df.select("v")
          }
          outcomes.add("won")
        } catch {
          case e: IllegalStateException =>
            outcomes.add(s"failed-fast: ${e.getMessage}")
            loserFailed.countDown()
        }
      }, s"compact-runner-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    val (wins, fails) =
      (outcomes.toArray(Array.empty[String])).partition(_ == "won")
    assert(wins.length == 1 && fails.length == 1,
      s"expected exactly one winner + one fail-fast, got: $outcomes")
    assert(fails.head.contains("maintenance lease held"),
      s"loser failed for the wrong reason: ${fails.head}")
    // no data loss: the winner's fold committed, every row survives
    assert(mergedRows(partials) == expect,
      "concurrent compact lost rows")
    // the lease was released: a fresh maintenance pass acquires cleanly
    BlockStore.acquireMaintenanceLease(partials).release()
  }

  test("a stale lease is stolen with a larger fencing epoch, and the " +
    "stale runner aborts at the swap leaving the live dir untouched") {
    val partials = tmpDir("bs-lease-fence") + "/store"
    writeBlock(partials, 0L, Seq(1L, 2L))
    val before = mergedRows(partials)

    // runner A stalls past its TTL (simulated with an already-expired
    // deadline); runner B steals and must carry a LARGER fencing epoch
    val a = BlockStore.acquireMaintenanceLease(partials, ttlMs = -1000L)
    val b = BlockStore.acquireMaintenanceLease(partials)
    assert(b.epoch > a.epoch,
      s"steal did not advance the fencing epoch: ${a.epoch} -> ${b.epoch}")
    intercept[IllegalStateException](a.check())
    assert(b.owner != a.owner)
    b.check() // the new holder is live

    // A wakes up and tries to commit its (stale) staged copy: the
    // fencing check at the swap point must abort BEFORE the rename
    // pair, so the live dir keeps B's view of the world
    val root = Paths.get(partials).toAbsolutePath
    intercept[IllegalStateException] {
      Store.swapDirectoryFenced(
        root.getParent.toString, root.getFileName.toString,
        () => a.check()) { tmp =>
        import spark.implicits._
        Seq(999L).toDF("v").coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/block=0")
      }
    }
    assert(mergedRows(partials) == before,
      "a fenced-out runner's staged copy went live")

    // A's release is a no-op on a stolen lease; B still holds it
    a.release()
    b.check()
    b.release()
    // after B releases, the next acquisition gets a yet larger epoch
    val c = BlockStore.acquireMaintenanceLease(partials)
    assert(c.epoch > b.epoch)
    c.release()
  }

  test("a torn lease read (file created, content not yet written) is " +
    "an in-flight writer, not a stale lease: the second acquirer " +
    "grace-waits and fails fast instead of stealing") {
    // regression for the two-leaseholder race: CREATE_NEW and the
    // content write are two syscalls, and the old code ruled an empty
    // lease file "torn ⇒ stale" and stole it immediately
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val partials = tmpDir("bs-lease-torn") + "/store"
    Files.createDirectories(Paths.get(partials))
    val root = Paths.get(partials).toAbsolutePath
    val leaseFile = root.getParent.resolve(s".lease_${root.getFileName}")

    // simulate the winner mid-acquisition: file exists, zero bytes yet
    Files.write(leaseFile, Array.emptyByteArray, StandardOpenOption.CREATE_NEW)
    val writer = new Thread(() => {
      Thread.sleep(200L) // the gap between the two syscalls
      Files.writeString(leaseFile,
        s"7 in-flight-owner ${System.currentTimeMillis() + 600000L}\n")
    })
    writer.start()
    // the second acquirer must observe the content that lands during
    // its grace window and fail fast on the LIVE deadline — pre-fix it
    // stole the empty file and returned a second live lease
    val e = intercept[IllegalStateException](
      BlockStore.acquireMaintenanceLease(partials))
    writer.join()
    assert(e.getMessage.contains("maintenance lease held"),
      s"torn read was not resolved to the in-flight lease: ${e.getMessage}")
    assert(Files.readString(leaseFile).contains("in-flight-owner"),
      "the in-flight writer's lease was deleted by the grace path")

    // and the true-crash shape — writer died between the syscalls, the
    // file stays empty past the grace window — IS stolen, with an epoch
    Files.delete(leaseFile)
    Files.write(leaseFile, Array.emptyByteArray, StandardOpenOption.CREATE_NEW)
    val stolen = BlockStore.acquireMaintenanceLease(partials)
    stolen.check()
    stolen.release()
  }

  test("N concurrent stealers of one stale lease: exactly one " +
    "acquisition survives (serialized steal, not bare delete)") {
    // regression for the double-steal: with an unserialized delete, two
    // runners that both observed the stale record could interleave so
    // the second's deleteIfExists removed the FIRST's freshly created
    // LIVE lease — two live leaseholders compacting concurrently (and
    // even an atomic-rename claim left its verify-and-restore an
    // absence window admitting a second CREATE_NEW winner). The
    // steal-lock serializes removal and re-verifies staleness under
    // it, so across ANY interleaving exactly one acquirer returns and
    // the rest fail fast.
    import java.nio.file.{Files, Paths}
    (0 until 8).foreach { round =>
      val partials = tmpDir(s"bs-steal-race-$round") + "/store"
      Files.createDirectories(Paths.get(partials))
      // a stale-but-well-formed lease: valid record, deadline long past
      BlockStore.acquireMaintenanceLease(partials, ttlMs = -60000L)
      val results =
        new java.util.concurrent.ConcurrentLinkedQueue[
          Either[String, BlockStore.MaintenanceLease]]()
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until 6).map { _ =>
        new Thread(() => {
          start.await()
          try results.add(
            Right(BlockStore.acquireMaintenanceLease(partials)))
          catch {
            case e: IllegalStateException =>
              results.add(Left(e.getMessage)); ()
          }
        })
      }
      threads.foreach(_.start())
      start.countDown()
      threads.foreach(_.join(30000L))
      val (fails, wins) = {
        import scala.jdk.CollectionConverters._
        results.asScala.toList.partitionMap(identity)
      }
      assert(wins.size == 1,
        s"round $round: ${wins.size} concurrent acquisitions survived " +
          s"a single stale lease (failures: ${fails.mkString(" | ")})")
      wins.head.check() // the survivor is fenced-in by the file content
      assert(fails.size == 5)
      // no steal-lock droppings survive a settled race
      val leftovers = {
        val s = Files.list(Paths.get(partials).getParent)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filter(_.startsWith(".steallock_")).toList
        } finally s.close()
      }
      assert(leftovers.isEmpty, s"round $round: $leftovers")
      wins.head.release()
    }
  }

  test("a corrupt fencing-epoch sidecar fails acquisition loudly " +
    "instead of minting a token that may regress") {
    import java.nio.file.{Files, Paths}
    val partials = tmpDir("bs-epoch-corrupt") + "/store"
    Files.createDirectories(Paths.get(partials))
    val root = Paths.get(partials).toAbsolutePath
    val epochFile = root.getParent.resolve(s".epoch_${root.getFileName}")
    Files.writeString(epochFile, "not-a-number\n")
    val e = intercept[IllegalStateException](
      BlockStore.acquireMaintenanceLease(partials))
    assert(e.getMessage.contains("corrupt fencing-epoch sidecar"),
      e.getMessage)
    // the documented re-arm: delete the sidecar, epochs restart from 1
    Files.delete(epochFile)
    val a = BlockStore.acquireMaintenanceLease(partials)
    assert(a.epoch == 1L)
    a.release()
    // and the normal path persists monotonically via the atomic write
    val b = BlockStore.acquireMaintenanceLease(partials)
    assert(b.epoch == 2L)
    b.release()
  }

  test("two concurrent fenced swaps stage into DISJOINT dirs: the " +
    "fenced-out runner's in-flight writes cannot reach the winner's " +
    "committed tree") {
    // regression for the shared-stage-path corruption: with one
    // .stage_<dir> path, runner B's pre-clean deleted runner A's
    // in-flight staged copy and A's late writes landed inside B's
    // staged tree — B's fence then committed the interleaved mix. With
    // per-owner suffixes each runner stages alone and the fence alone
    // arbitrates the rename.
    import java.nio.file.{Files, Paths}
    val parent = tmpDir("bs-stage-isolated")
    val dirName = "store"
    Files.createDirectories(Paths.get(parent, dirName))
    Files.writeString(Paths.get(parent, dirName, "seed.txt"), "v0\n")

    val aStagedFirst = new java.util.concurrent.CountDownLatch(1)
    val bStaged = new java.util.concurrent.CountDownLatch(1)
    val aDone = new java.util.concurrent.CountDownLatch(1)
    @volatile var aFenceError: Throwable = null

    val a = new Thread(() => {
      try Store.swapDirectoryFenced(parent, dirName,
        () => throw new IllegalStateException("lease lost (simulated)"),
        stageSuffix = "_ownerA") { tmp =>
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(tmp, "a-early.txt"), "A\n")
        aStagedFirst.countDown()
        // keep staging while B pre-cleans, stages, and waits to commit:
        // pre-fix this write landed inside B's staged tree (same path)
        assert(bStaged.await(30, java.util.concurrent.TimeUnit.SECONDS))
        Files.writeString(Paths.get(tmp, "a-late.txt"), "A-late\n")
      } catch { case t: Throwable => aFenceError = t }
      finally aDone.countDown()
    })
    a.start()
    assert(aStagedFirst.await(30, java.util.concurrent.TimeUnit.SECONDS))

    Store.swapDirectoryFenced(parent, dirName,
      () => assert(aDone.await(30, java.util.concurrent.TimeUnit.SECONDS)),
      stageSuffix = "_ownerB") { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "b.txt"), "B\n")
      bStaged.countDown()
      // B's stage ends here; its fence waits for A to finish writing
      // and get fenced out, maximizing the old corruption window
    }
    a.join(30000L)

    assert(aFenceError != null &&
      aFenceError.getMessage.contains("lease lost"),
      s"the stale runner was not fenced out: $aFenceError")
    val committed = {
      val s = Files.list(Paths.get(parent, dirName))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toList.sorted
      } finally s.close()
    }
    assert(committed == List("b.txt"),
      s"winner's committed tree was polluted: $committed")
    // both stage dirs are gone: B's consumed by the rename, A's
    // removed by its own finally-clean
    val stages = {
      val s = Files.list(Paths.get(parent))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith(".stage_")).toList
      } finally s.close()
    }
    assert(stages.isEmpty, s"leftover stage dirs: $stages")
  }

  test("crash injection: a runner dead mid-stage (live-looking stage " +
    "dir, stale lease, dead steal-lock past its 30 s deadline) never " +
    "pollutes the next runner's pass, and its zombie commit is fenced") {
    // the two residual windows the r11 scaladoc documented as prose:
    // (1) a crashed runner leaves a populated per-owner stage dir plus
    // a stale lease; (2) a crashed STEALER leaves a steal-lock whose
    // deadline has passed (the >30 s coincidence). Drive both at once
    // and pin that the commit-time fence — not cleanup luck — is what
    // keeps the corpse content out of the winner's tree.
    import java.nio.file.{Files, Paths}
    val partials = tmpDir("bs-crash-inject") + "/store"
    writeBlock(partials, 0L, Seq(1L, 2L))
    val root = Paths.get(partials).toAbsolutePath
    val parent = root.getParent
    val dirName = s"${root.getFileName}"

    // corpse 1: the dead runner's lease (epoch 5, deadline long past)
    // and the matching epoch sidecar — exactly what a kill -9 after
    // acquisition leaves behind
    val leaseFile = parent.resolve(s".lease_$dirName")
    Files.writeString(leaseFile,
      s"5 dead-owner ${System.currentTimeMillis() - 60000L}\n")
    Files.writeString(parent.resolve(s".epoch_$dirName"), "5\n")
    // corpse 2: its per-owner stage dir, fresh mtime (live-LOOKING —
    // younger than StageGraceMs, so no reap may remove it; only the
    // fence discipline keeps it from committing)
    val corpseStage = parent.resolve(s".stage_${dirName}_dead-owner")
    Files.createDirectories(corpseStage.resolve("block=99"))
    Files.writeString(
      corpseStage.resolve("block=99").resolve("corpse.txt"), "999\n")
    // corpse 3: a dead stealer's lock, deadline >30 s in the past
    val lockFile = parent.resolve(s".steallock_$dirName")
    Files.writeString(lockFile,
      s"dead-stealer ${System.currentTimeMillis() - 31000L}\n")

    // the next runner must reap the dead lock, steal the stale lease
    // with a LARGER epoch, and run its pass untouched by the corpses
    val b = BlockStore.acquireMaintenanceLease(partials)
    assert(b.epoch > 5L,
      s"steal over the corpse lease did not advance the epoch: ${b.epoch}")
    assert(!Files.exists(lockFile), "dead stealer's lock was not reaped")
    Store.swapDirectoryFenced(parent.toString, dirName,
      () => b.check(), stageSuffix = s"_${b.owner}") { tmp =>
      import spark.implicits._
      Seq(10L, 11L).toDF("v").coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/block=0")
    }
    assert(mergedRows(partials) == Seq(10L, 11L),
      "winner's committed tree diverged")

    // the zombie wakes up with its old lease identity and replays its
    // commit path over its corpse stage dir: the fence must reject it
    // and the winner's tree must keep exactly the winner's rows
    val zombie = BlockStore.MaintenanceLease(leaseFile, "dead-owner", 5L)
    val e = intercept[IllegalStateException] {
      Store.swapDirectoryFenced(parent.toString, dirName,
        () => zombie.check(), stageSuffix = "_dead-owner") { tmp =>
        import spark.implicits._
        Seq(999L).toDF("v").coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/block=99")
      }
    }
    assert(e.getMessage.contains("maintenance lease lost"),
      s"zombie was not fenced: ${e.getMessage}")
    assert(mergedRows(partials) == Seq(10L, 11L),
      "zombie corpse content reached the winner's tree")
    // the zombie's replayed stage attempt cleaned itself up (the
    // pre-clean + finally-clean of its own suffixed path)
    assert(!Files.exists(corpseStage),
      "zombie stage corpse survived its fenced-out replay")
    b.release()
    // the machinery is healthy afterwards: a fresh acquisition works
    val c = BlockStore.acquireMaintenanceLease(partials)
    assert(c.epoch > b.epoch)
    c.release()
  }

  test("a lease steal landing BETWEEN the backup move and the commit " +
    "move aborts into rollback (fence re-check inside the rename pair)") {
    // regression for the r11 ADVICE window: fence() passed, the live
    // dir was moved aside, and a steal landing before the commit move
    // still committed the stale staged copy. The re-check between the
    // two renames must turn that into a rollback.
    import java.nio.file.{Files, Paths}
    val parent = tmpDir("bs-fence-midswap")
    val dirName = "store"
    Files.createDirectories(Paths.get(parent, dirName))
    Files.writeString(Paths.get(parent, dirName, "live.txt"), "v0\n")

    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      Store.swapDirectoryFenced(parent, dirName, () => {
        // first check (before the rename pair) passes; the steal lands
        // "inside" the pair, so the second check throws
        if (calls.incrementAndGet() >= 2)
          throw new IllegalStateException("lease lost mid-swap (simulated)")
      }) { tmp =>
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(tmp, "stale.txt"), "STALE\n")
      }
    }
    assert(e.getMessage.contains("mid-swap"))
    assert(calls.get() == 2, s"fence ran ${calls.get()} times, expected 2")
    // rolled back: the live dir holds the previous copy, no .old_ or
    // .stage_ residue
    assert(Files.readString(Paths.get(parent, dirName, "live.txt")) == "v0\n")
    assert(!Files.exists(Paths.get(parent, dirName, "stale.txt")),
      "the stale staged copy went live despite the mid-swap steal")
    val residue = {
      val s = Files.list(Paths.get(parent))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith(".old_") || n.startsWith(".stage_"))
          .toList
      } finally s.close()
    }
    assert(residue.isEmpty, s"rename-pair residue left behind: $residue")
  }

  test("the IRREDUCIBLE window, driven deterministically: a steal " +
    "landing between the final fence re-check and the commit rename " +
    "commits the stale copy, and the new holder's next pass self-heals") {
    // the one interleaving fencing-by-check cannot close (the scaladoc's
    // documented residue at Store.swapDirectoryFenced): runner A passes
    // BOTH fence checks, then — inside the single-syscall window before
    // its commit rename — runner B steals the (expired) lease. A's
    // stale staged copy goes live over a store B now owns. The claim
    // this test pins: the damage is BOUNDED — A is fenced out of all
    // future work, and B's next ordinary maintenance pass overwrites
    // the stale copy, with no residue dirs at any point.
    import java.nio.file.{Files, Paths}
    val partials = tmpDir("bs-irreducible") + "/store"
    writeBlock(partials, 0L, Seq(1L, 2L))
    val root = Paths.get(partials).toAbsolutePath
    val parent = root.getParent
    val dirName = s"${root.getFileName}"
    Files.createDirectories(root)
    Files.writeString(root.resolve("live.txt"), "v0\n")

    // A's lease expires almost immediately — the steal inside the
    // window below is a LEGITIMATE steal, not a forced file rewrite
    val a = BlockStore.acquireMaintenanceLease(partials, ttlMs = 1L)
    var b: BlockStore.MaintenanceLease = null
    Store.commitWindowHook = () => {
      Thread.sleep(5L) // a's 1 ms deadline is safely past
      b = BlockStore.acquireMaintenanceLease(partials)
      assert(b.epoch > a.epoch,
        s"steal did not advance the fencing epoch: ${b.epoch} vs ${a.epoch}")
    }
    try {
      // A's swap RUNS TO COMPLETION — both fence checks passed before
      // the steal landed, so nothing aborts it
      Store.swapDirectoryFenced(parent.toString, dirName,
        () => a.check(), stageSuffix = s"_${a.owner}") { tmp =>
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(tmp, "stale.txt"), "A-STALE\n")
      }
    } finally Store.commitWindowHook = () => ()

    // the documented outcome: the stale copy IS live (this is the
    // residue — if this assertion ever fails, the window got closed and
    // the scaladoc should say so instead)
    assert(Files.exists(root.resolve("stale.txt")) &&
      !Files.exists(root.resolve("live.txt")),
      "expected the stale commit to land — the documented residue")

    // bounded, part 1: A is fenced out of everything after the window —
    // its next fenced attempt aborts before touching the store
    val e = intercept[IllegalStateException] {
      Store.swapDirectoryFenced(parent.toString, dirName,
        () => a.check(), stageSuffix = s"_${a.owner}") { tmp =>
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(tmp, "again.txt"), "A-AGAIN\n")
      }
    }
    assert(e.getMessage.contains("maintenance lease lost"))
    assert(Files.exists(root.resolve("stale.txt")),
      "the fenced-out retry still mutated the store")

    // bounded, part 2: B's next ORDINARY pass self-heals — the stale
    // copy is replaced wholesale by the swap discipline itself
    Store.swapDirectoryFenced(parent.toString, dirName,
      () => b.check(), stageSuffix = s"_${b.owner}") { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "healed.txt"), "B\n")
    }
    assert(Files.exists(root.resolve("healed.txt")) &&
      !Files.exists(root.resolve("stale.txt")),
      "the new holder's pass did not replace the stale commit")
    val residue = {
      val s = Files.list(parent)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith(".old_") || n.startsWith(".stage_"))
          .toList
      } finally s.close()
    }
    assert(residue.isEmpty, s"residue dirs left behind: $residue")
    b.release()
  }
}
