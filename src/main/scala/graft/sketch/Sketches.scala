package graft.sketch

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch, LongsSketch}
import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable, persistable sketch aggregates over Apache DataSketches —
  * the north_star's column statistics: HLL++ uniqueness on image_id/phash,
  * t-digest quantiles on w/h/byte-size, frequent-items on fmt/phash.
  *
  * Implementation choice (SURVEY.md §7.3): public
  * `Aggregator[IN, BUF, OUT]` + `udaf()`. Spark wraps this in a
  * TypedImperativeAggregate (`ScalaAggregator`), so the buffer lives as a
  * mutable JVM object per partition and is (de)serialized ONLY at partial
  * aggregation boundaries — map-side combine + final merge is exactly the
  * executor-tree merge the reference-scale plan needs; no per-row ser/deser.
  *
  * OUT is always the serialized sketch (`Array[Byte]`) so results persist
  * in the snapshot manifest and merge ACROSS jobs (drift baselines).
  */
object Sketches {

  // ------------------------------------------------------------ buffers ----
  // Wrappers give the sketches Java-serialization via their own compact
  // binary formats (used by Spark only at shuffle boundaries).

  final class HllBuf(@transient var sk: HllSketch) extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toCompactByteArray; out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt()); in.readFully(b); sk = HllSketch.heapify(b)
    }
  }

  final class TdBuf(@transient var sk: TDigestDouble) extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toByteArray; out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      sk = TDigestDouble.heapify(Memory.wrap(b))
    }
  }

  final class FreqLongBuf(@transient var sk: LongsSketch) extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toByteArray; out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      sk = LongsSketch.getInstance(Memory.wrap(b))
    }
  }

  final class FreqStringBuf(@transient var sk: ItemsSketch[String]) extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toByteArray(new ArrayOfStringsSerDe); out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      sk = ItemsSketch.getInstance(Memory.wrap(b), new ArrayOfStringsSerDe)
    }
  }

  private def bufEnc[T](implicit ct: scala.reflect.ClassTag[T]): Encoder[T] =
    Encoders.javaSerialization[T](ct)

  // --------------------------------------------------------- aggregators ----

  /** HLL++ distinct-count sketch over a string key (e.g. image_id). */
  final class HllStringAgg(lgK: Int) extends Aggregator[String, HllBuf, Array[Byte]] {
    def zero = new HllBuf(new HllSketch(lgK, TgtHllType.HLL_8))
    def reduce(b: HllBuf, a: String): HllBuf = { if (a != null) b.sk.update(a); b }
    def merge(x: HllBuf, y: HllBuf): HllBuf = {
      val u = new Union(math.max(x.sk.getLgConfigK, y.sk.getLgConfigK))
      u.update(x.sk); u.update(y.sk); new HllBuf(u.getResult(TgtHllType.HLL_8))
    }
    def finish(b: HllBuf): Array[Byte] = b.sk.toCompactByteArray
    def bufferEncoder: Encoder[HllBuf] = bufEnc[HllBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** HLL++ distinct-count sketch over a long key (e.g. phash). */
  final class HllLongAgg(lgK: Int) extends Aggregator[java.lang.Long, HllBuf, Array[Byte]] {
    def zero = new HllBuf(new HllSketch(lgK, TgtHllType.HLL_8))
    def reduce(b: HllBuf, a: java.lang.Long): HllBuf = { if (a != null) b.sk.update(a.longValue); b }
    def merge(x: HllBuf, y: HllBuf): HllBuf = {
      val u = new Union(math.max(x.sk.getLgConfigK, y.sk.getLgConfigK))
      u.update(x.sk); u.update(y.sk); new HllBuf(u.getResult(TgtHllType.HLL_8))
    }
    def finish(b: HllBuf): Array[Byte] = b.sk.toCompactByteArray
    def bufferEncoder: Encoder[HllBuf] = bufEnc[HllBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** t-digest quantile sketch over a numeric column (w, h, byte size). */
  final class TDigestAgg(k: Short) extends Aggregator[java.lang.Double, TdBuf, Array[Byte]] {
    def zero = new TdBuf(new TDigestDouble(k))
    def reduce(b: TdBuf, a: java.lang.Double): TdBuf = {
      if (a != null && !a.isNaN) b.sk.update(a.doubleValue); b
    }
    def merge(x: TdBuf, y: TdBuf): TdBuf = { x.sk.merge(y.sk); x }
    def finish(b: TdBuf): Array[Byte] = { b.sk.compress(); b.sk.toByteArray }
    def bufferEncoder: Encoder[TdBuf] = bufEnc[TdBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Frequent-items (count-min-style heavy hitters) over a long key. */
  final class FreqLongAgg(maxMapSize: Int) extends Aggregator[java.lang.Long, FreqLongBuf, Array[Byte]] {
    def zero = new FreqLongBuf(new LongsSketch(maxMapSize))
    def reduce(b: FreqLongBuf, a: java.lang.Long): FreqLongBuf = { if (a != null) b.sk.update(a.longValue); b }
    def merge(x: FreqLongBuf, y: FreqLongBuf): FreqLongBuf = { x.sk.merge(y.sk); x }
    def finish(b: FreqLongBuf): Array[Byte] = b.sk.toByteArray
    def bufferEncoder: Encoder[FreqLongBuf] = bufEnc[FreqLongBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Frequent-items over a string key (fmt frequencies). */
  final class FreqStringAgg(maxMapSize: Int) extends Aggregator[String, FreqStringBuf, Array[Byte]] {
    def zero = new FreqStringBuf(new ItemsSketch[String](maxMapSize))
    def reduce(b: FreqStringBuf, a: String): FreqStringBuf = { if (a != null) b.sk.update(a); b }
    def merge(x: FreqStringBuf, y: FreqStringBuf): FreqStringBuf = { x.sk.merge(y.sk); x }
    def finish(b: FreqStringBuf): Array[Byte] = b.sk.toByteArray(new ArrayOfStringsSerDe)
    def bufferEncoder: Encoder[FreqStringBuf] = bufEnc[FreqStringBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ------------------------------------------------- Column constructors ----

  def hllString(c: Column, lgK: Int = 12): Column = udaf(new HllStringAgg(lgK)).apply(c)
  def hllLong(c: Column, lgK: Int = 12): Column = udaf(new HllLongAgg(lgK)).apply(c)
  def tdigest(c: Column, k: Short = 200): Column = udaf(new TDigestAgg(k)).apply(c.cast("double"))
  def freqLong(c: Column, maxMapSize: Int = 1024): Column = udaf(new FreqLongAgg(maxMapSize)).apply(c)
  def freqString(c: Column, maxMapSize: Int = 256): Column = udaf(new FreqStringAgg(maxMapSize)).apply(c)

  // ----------------------------------------------- driver-side operations ----

  def hllEstimate(bytes: Array[Byte]): Double = HllSketch.heapify(bytes).getEstimate

  def hllMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = new Union(12); u.update(HllSketch.heapify(a)); u.update(HllSketch.heapify(b))
    u.getResult(TgtHllType.HLL_8).toCompactByteArray
  }

  def td(bytes: Array[Byte]): TDigestDouble = TDigestDouble.heapify(Memory.wrap(bytes))
  def tdQuantile(bytes: Array[Byte], q: Double): Double = td(bytes).getQuantile(q)
  def tdMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = td(a); x.merge(td(b)); x.compress(); x.toByteArray
  }

  def freqLongMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = LongsSketch.getInstance(Memory.wrap(a))
    x.merge(LongsSketch.getInstance(Memory.wrap(b))).toByteArray
  }

  def freqStringMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val serde = new ArrayOfStringsSerDe
    val x = ItemsSketch.getInstance(Memory.wrap(a), serde)
    x.merge(ItemsSketch.getInstance(Memory.wrap(b), serde)).toByteArray(serde)
  }

  def freqLongTopK(bytes: Array[Byte], k: Int): Seq[(Long, Long)] =
    LongsSketch
      .getInstance(Memory.wrap(bytes))
      .getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .toSeq
      .sortBy(-_.getEstimate)
      .take(k)
      .map(r => (r.getItem, r.getEstimate))

  def freqStringItems(bytes: Array[Byte]): Seq[(String, Long)] =
    ItemsSketch
      .getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .toSeq
      .map(r => (r.getItem, r.getEstimate))
}
