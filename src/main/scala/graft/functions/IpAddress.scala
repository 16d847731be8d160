package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IPADDRESS (SPI/type/IpAddressType.java, MAIN/type/IpAddressOperators.java):
  * a fixed 16-byte value — IPv4 addresses stored as the IPv4-mapped IPv6
  * form ::ffff:a.b.c.d — compared bytewise unsigned, rendered in RFC 5952
  * canonical text (lowercase hex, longest ≥2 zero run compressed, mapped
  * IPv4 shown dotted). Mirrored with the [[Tstz]]/[[Ttz]] recipe: a
  * single-field struct of the 16 raw bytes. Struct comparison/grouping
  * delegates to Spark's unsigned lexicographic binary semantics — the same
  * order as the reference's Slice.compareTo — so ORDER BY / GROUP BY /
  * DISTINCT / joins on ipaddress need no extra rewrites.
  */
object IpAddr {
  val B = "__ip"

  val dataType: StructType =
    StructType(Seq(StructField(B, BinaryType, nullable = true)))

  def isIp(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.length == 1 && s.fields(0).name == B
    case _ => false
  }

  def bytes(e: Expression): Expression = GetStructField(e, 0, Some(B))

  /** varchar → 16 bytes (IpAddressOperators.castFromVarcharToIpAddress:
    * Guava forString — textual parse only, never a DNS lookup — then the
    * 4-byte form widens to IPv4-mapped). */
  def parse(s: String): Array[Byte] =
    widen(
      try com.google.common.net.InetAddresses.forString(s).getAddress
      catch {
        case _: IllegalArgumentException => throw new IllegalArgumentException(
          s"Cannot cast value to IPADDRESS: $s")
      })

  def widen(addr: Array[Byte]): Array[Byte] =
    if (addr.length == 16) addr
    else {
      val b = new Array[Byte](16)
      b(10) = 0xff.toByte
      b(11) = 0xff.toByte
      System.arraycopy(addr, 0, b, 12, 4)
      b
    }

  /** 16 bytes → canonical text (castFromIpAddressToVarchar:
    * InetAddress.getByAddress collapses the mapped form to Inet4Address,
    * so IPv4 renders dotted; IPv6 renders per RFC 5952). */
  def render(b: Array[Byte]): String =
    com.google.common.net.InetAddresses.toAddrString(
      java.net.InetAddress.getByAddress(b))
}

/** CAST(varchar AS IPADDRESS). */
case class IpFromString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IpAddr.dataType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    InternalRow(IpAddr.parse(v.toString))
  override protected def withNewChildInternal(c: Expression): IpFromString =
    copy(child = c)
}

/** CAST(varbinary AS IPADDRESS): 4 bytes widen, 16 pass through, anything
  * else is the reference's INVALID_CAST_ARGUMENT. */
case class IpFromBinary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IpAddr.dataType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[Array[Byte]]
    if (a.length == 4 || a.length == 16) InternalRow(IpAddr.widen(a))
    else throw new IllegalArgumentException(
      s"Invalid IP address binary length: ${a.length}")
  }
  override protected def withNewChildInternal(c: Expression): IpFromBinary =
    copy(child = c)
}

/** CAST(ipaddress AS VARCHAR): RFC 5952 canonical rendering. */
case class IpToString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null || row.isNullAt(0)) null
    else UTF8String.fromString(IpAddr.render(row.getBinary(0)))
  }
  override protected def withNewChildInternal(c: Expression): IpToString =
    copy(child = c)
}

/** Type-dispatched builder behind graft_to_ipaddress /
  * CAST(x AS IPADDRESS). */
case class IpCast(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case dt if IpAddr.isIp(dt) => child
    case _: StringType => IpFromString(child)
    case BinaryType => IpFromBinary(child)
    case _ => IpFromString(Cast(child, StringType))
  }
  override protected def withNewChildInternal(c: Expression): IpCast =
    copy(child = c)
}
