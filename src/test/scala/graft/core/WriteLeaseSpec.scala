package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[WriteLease]]: mutual exclusion under real thread contention,
  * fail-loud contention, expired-lease steal under an injected clock,
  * the stolen-mid-run LeaseLost contract, and the isHeld probe. Pure
  * filesystem semantics — no SparkSession needed.
  */
class WriteLeaseSpec extends AnyFunSuite with Matchers {

  private def tmpIndex(): String =
    Files.createTempDirectory("graft_lease_").toString

  test("contended writers serialize: no two bodies overlap, all run") {
    val path = tmpIndex()
    val inside = new AtomicInteger(0)
    val maxInside = new AtomicInteger(0)
    val ran = new AtomicInteger(0)
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        WriteLease.withLease(path, s"w$i", ttlMs = 60000L,
          maxWaitMs = 30000L, pollMs = 5L) {
          val now = inside.incrementAndGet()
          maxInside.updateAndGet(m => math.max(m, now))
          Thread.sleep(20)
          inside.decrementAndGet()
          ran.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    ran.get() shouldBe 8
    maxInside.get() shouldBe 1
    // released: the lease file is gone
    Files.exists(Paths.get(path, "_WRITE_LEASE")) shouldBe false
  }

  test("fail-loud when held and maxWaitMs elapses") {
    val path = tmpIndex()
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => {
      WriteLease.withLease(path, "holder", ttlMs = 60000L) {
        entered.countDown()
        release.await(30, TimeUnit.SECONDS)
        ()
      }
    })
    holder.start()
    entered.await(10, TimeUnit.SECONDS) shouldBe true
    val ex = intercept[WriteLease.LeaseLost] {
      WriteLease.withLease(path, "late", ttlMs = 60000L, maxWaitMs = 0L) {
        fail("body must not run")
      }
    }
    ex.getMessage should include("held by holder")
    release.countDown()
    holder.join(30000)
    WriteLease.isHeld(path) shouldBe false
  }

  test("an expired lease (crashed holder) is stolen deterministically " +
    "under an injected clock") {
    val path = tmpIndex()
    // a crashed holder's leftover: expired per the injected clock
    Files.write(Paths.get(path, "_WRITE_LEASE"),
      "dead\t00000000-dead\t1000".getBytes(StandardCharsets.UTF_8))
    val now = new AtomicLong(5000L) // well past expiresAt = 1000
    val clock: () => Long = () => now.get()
    WriteLease.isHeld(path, clock = clock) shouldBe false
    var ran = false
    WriteLease.withLease(path, "thief", ttlMs = 10000L,
      clock = clock) { ran = true }
    ran shouldBe true
    Files.exists(Paths.get(path, "_WRITE_LEASE")) shouldBe false
  }

  test("a lease stolen mid-run surfaces as LeaseLost AFTER the body, " +
    "and the thief's work proceeds") {
    val path = tmpIndex()
    val victimRan = new AtomicInteger(0)
    val thiefRan = new AtomicInteger(0)
    val victimErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val victim = new Thread(() => {
      try WriteLease.withLease(path, "victim", ttlMs = 150L) {
        victimRan.incrementAndGet()
        Thread.sleep(900) // overrun the TTL so the thief may steal
      } catch { case t: Throwable => victimErr.set(t) }
    })
    victim.start()
    Thread.sleep(300) // victim holds, TTL already elapsed
    WriteLease.withLease(path, "thief", ttlMs = 60000L,
      maxWaitMs = 10000L, pollMs = 10L) {
      thiefRan.incrementAndGet()
    }
    victim.join(30000)
    victimRan.get() shouldBe 1
    thiefRan.get() shouldBe 1
    victimErr.get() shouldBe a[WriteLease.LeaseLost]
    victimErr.get().getMessage should include("stolen")
  }

  test("isHeld reflects live, expired, and absent leases") {
    val path = tmpIndex()
    WriteLease.isHeld(path) shouldBe false
    val now = new AtomicLong(1000L)
    val clock: () => Long = () => now.get()
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => {
      WriteLease.withLease(path, "h", ttlMs = 5000L, clock = clock) {
        entered.countDown()
        release.await(30, TimeUnit.SECONDS)
        ()
      }
    })
    holder.start()
    entered.await(10, TimeUnit.SECONDS) shouldBe true
    WriteLease.isHeld(path, clock = clock) shouldBe true
    now.set(7000L) // past expiry: held no more, without any FS change
    WriteLease.isHeld(path, clock = clock) shouldBe false
    release.countDown()
    holder.join(30000)
  }
}
