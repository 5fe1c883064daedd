package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.sources._

import graft.catalog.TableCatalog

/** Spark source filters → Catalyst Columns, for the metadata-level DML
  * paths (SQL DELETE, replaceWhere). None = untranslatable — callers
  * must REJECT, never approximate. */
private[connector] object FilterColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col => c, lit}

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(c(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(c(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(c(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(c(a) >= lit(v))
    case LessThan(a, v)           => Some(c(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(c(a) <= lit(v))
    case In(a, vs)                => Some(c(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(c(a).isNull)
    case IsNotNull(a)             => Some(c(a).isNotNull)
    case StringStartsWith(a, v)   => Some(c(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(c(a).endsWith(v))
    case StringContains(a, v)     => Some(c(a).contains(v))
    case And(l, r) =>
      for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r) =>
      for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(x) => toColumn(x).map(!_)
    case AlwaysTrue()  => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  /** Conjunction of all filters; None if any leg is untranslatable. */
  def conjunction(filters: Seq[Filter]): Option[Column] = {
    val legs = filters.map(toColumn)
    if (legs.exists(_.isEmpty)) None
    else Some(legs.flatten.reduceOption(_ && _).getOrElse(lit(true)))
  }
}

/** Planning-time file elimination shared by the connector's batch scan
  * and streaming source: a file survives unless the `_STATS` [min,max]
  * interval proves a pushed comparison impossible or the `_BLOOMS`
  * bitset excludes an equality value. Missing sidecars ⇒ keep (the
  * skipping is advisory — Spark re-applies every filter row-level). */
private[connector] object FileSkipping {

  private def flatten(f: Filter): Seq[Filter] = f match {
    case And(l, r) => flatten(l) ++ flatten(r)
    case other     => Seq(other)
  }

  def surviving(c: TableCatalog, fq: String, v: Int, files: Seq[String],
      filters: Seq[Filter]): Seq[String] = {
    val active = filters.flatMap(flatten)
    if (active.isEmpty || files.isEmpty) return files
    val stats = c.statsByPath(fq, v)
    val bloomCols = active.flatMap {
      case EqualTo(col, _) => Some(col)
      case In(col, _)      => Some(col)
      case _ => None
    }.distinct
    val blooms: Map[String, Map[String, Array[Long]]] =
      bloomCols.map(col => col -> c.bloomsByPath(fq, v, col)).toMap

    def key(p: String) = new Path(p).toUri.getPath
    // numerics identity, dates as epoch days, timestamps as epoch
    // micros — the `_STATS` storage convention
    def statVal(x: Any): Option[BigDecimal] = TableCatalog.statDecimal(x)
    def str(x: Any): String = x match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => String.valueOf(other)
    }

    files.filter { p =>
      val st = stats.get(key(p))
      def bounds(col: String) = st.flatMap(_.get(col))
      def mayEqual(col: String, x: Any): Boolean = {
        val statOk = (statVal(x), bounds(col)) match {
          case (Some(v0), Some((mn, mx))) => v0 >= mn && v0 <= mx
          case _ => true
        }
        val bloomOk = blooms.get(col).flatMap(_.get(key(p))) match {
          case Some(bits) => x match {
            case _: Byte | _: Short | _: Int | _: Long | _: String |
                 _: org.apache.spark.unsafe.types.UTF8String =>
              c.bloomMayContain(bits, str(x))
            case _ => true
          }
          case None => true
        }
        statOk && bloomOk
      }
      active.forall {
        case EqualTo(col, x) => mayEqual(col, x)
        case In(col, xs)     => xs.exists(x => mayEqual(col, x))
        case GreaterThan(col, x) => (statVal(x), bounds(col)) match {
          case (Some(v0), Some((_, mx))) => mx > v0
          case _ => true
        }
        case GreaterThanOrEqual(col, x) => (statVal(x), bounds(col)) match {
          case (Some(v0), Some((_, mx))) => mx >= v0
          case _ => true
        }
        case LessThan(col, x) => (statVal(x), bounds(col)) match {
          case (Some(v0), Some((mn, _))) => mn < v0
          case _ => true
        }
        case LessThanOrEqual(col, x) => (statVal(x), bounds(col)) match {
          case (Some(v0), Some((mn, _))) => mn <= v0
          case _ => true
        }
        case _ => true
      }
    }
  }
}
