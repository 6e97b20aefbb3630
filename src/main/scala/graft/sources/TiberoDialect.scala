package graft.sources

import java.sql.Types
import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** JDBC dialect for Tibero (the reference's RDBMS — connected via
  * jaydebeapi in `/root/reference/data_seoul_1_category.py:27-33`), whose
  * SQL surface and type system follow Oracle's.
  *
  * The READ mapping — the half the reference exercises (catalog scans over
  * VARCHAR2/NUMBER/DATE columns) — is explicit here so it is unit-testable
  * offline (JdbcSpec) instead of asserted in prose:
  *
  *  - VARCHAR2 / NVARCHAR2 / CHAR / NCHAR / CLOB / NCLOB / LONG → StringType
  *  - NUMBER(p,s)   → DecimalType(p,s)  (s > 0)
  *  - NUMBER(p)     → the narrowest integral type that holds p digits
  *  - NUMBER        → DecimalType(38,10) (unconstrained declaration)
  *  - DATE          → TimestampType (Tibero DATE carries time-of-day,
  *                    like Oracle's — NOT a calendar date)
  *  - BINARY_FLOAT / BINARY_DOUBLE → FloatType / DoubleType
  *
  * The WRITE mapping emits the corresponding DDL (VARCHAR2(255) for
  * strings — Tibero has no unbounded VARCHAR; NUMBER(1) booleans, since
  * there is no boolean column type).
  *
  * Registered on first use of the [[Jdbc]] facade; `canHandle` keys on the
  * `jdbc:tibero:` URL scheme so every other URL falls through to Spark's
  * stock dialects.
  */
object TiberoDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:tibero:")

  override def getCatalystType(
      sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    typeName.toUpperCase(Locale.ROOT) match {
      case "VARCHAR2" | "NVARCHAR2" | "CHAR" | "NCHAR" | "CLOB" | "NCLOB" |
          "LONG" => Some(StringType)
      case "NUMBER" =>
        val scale = scaleOf(md)
        if (size == 0) Some(DecimalType(38, 10)) // unconstrained NUMBER
        // negative scale is legal (NUMBER(8,-5) stores values to ~10^13):
        // widen precision by |scale|, integral storage
        else if (scale < 0) Some(DecimalType(math.min(38, size - scale), 0))
        // scale > precision is legal too (NUMBER(2,5) stores 0.000xy):
        // Spark's DecimalType needs precision >= scale
        else if (scale > size) Some(DecimalType(math.min(38, scale), math.min(38, scale)))
        else if (scale > 0) Some(DecimalType(math.min(size, 38), scale))
        else if (size <= 9) Some(IntegerType)    // 10^9 < 2^31
        else if (size <= 18) Some(LongType)      // 10^18 < 2^63
        else Some(DecimalType(math.min(size, 38), 0))
      case "DATE" => Some(TimestampType) // carries time-of-day
      case "BINARY_FLOAT" => Some(FloatType)
      case "BINARY_DOUBLE" => Some(DoubleType)
      case _ => None // fall through to Spark's default Types.* mapping
    }

  private def scaleOf(md: MetadataBuilder): Int = {
    val built = md.build()
    if (built.contains("scale")) built.getLong("scale").toInt else 0
  }

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("VARCHAR2(255)", Types.VARCHAR))
    case BooleanType => Some(JdbcType("NUMBER(1)", Types.NUMERIC))
    case ByteType => Some(JdbcType("NUMBER(3)", Types.NUMERIC))
    case ShortType => Some(JdbcType("NUMBER(5)", Types.NUMERIC))
    case IntegerType => Some(JdbcType("NUMBER(10)", Types.NUMERIC))
    case LongType => Some(JdbcType("NUMBER(19)", Types.NUMERIC))
    case FloatType => Some(JdbcType("BINARY_FLOAT", Types.FLOAT))
    case DoubleType => Some(JdbcType("BINARY_DOUBLE", Types.DOUBLE))
    case TimestampType => Some(JdbcType("TIMESTAMP", Types.TIMESTAMP))
    case _ => None
  }

  // Tibero, like Oracle, truncates via TRUNCATE TABLE without cascade.
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  /** Idempotent registration with Spark's dialect registry. */
  lazy val registered: Unit = JdbcDialects.registerDialect(this)
}
