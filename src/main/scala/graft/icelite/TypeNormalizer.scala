package graft.icelite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The reference's 8-primitive type system (SURVEY.md §1.2; semantics of
  * `/root/reference/bot_iceberg_loader.py:201-242`): inferred schemas are
  * normalized onto {string, double, float, long, int, timestamp, date,
  * boolean}, with *anything else* falling back to string. Applied after CSV
  * inference so the table schema is deterministic regardless of the
  * inference engine's quirks.
  */
object TypeNormalizer {

  /** Target type for an inferred type; None means "unsupported -> string". */
  def normalizeType(dt: DataType): DataType = dt match {
    case StringType                             => StringType
    case DoubleType                             => DoubleType
    case FloatType                              => FloatType
    case LongType                               => LongType
    case IntegerType | ShortType | ByteType    => IntegerType
    case TimestampType | TimestampNTZType       => dt
    case DateType                               => DateType
    case BooleanType                            => BooleanType
    case _                                      => StringType // fallback rule
  }

  /** Cast every column of `df` onto the normalized type system. */
  def normalize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val target = normalizeType(f.dataType)
      if (target == f.dataType) col(f.name) else col(f.name).cast(target).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
