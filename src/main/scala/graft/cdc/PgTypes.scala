package graft.cdc

import org.apache.spark.sql.types._

import PgOutput.{RelationInfo, TypeInfo}

/** Builtin PostgreSQL type OID → Spark `DataType` registry — the
  * wire-driven half of the typed-projection layer.
  *
  * The reference stores each column's `type_id` in its relation
  * registry and never consults it (pg_output_parser.py:79,86 — the
  * SURVEY §1.2 unused-metadata flaw); [[TypedView]] closed half the
  * gap by applying a CALLER-supplied schema. This object closes the
  * rest: a typed view derivable from the wire alone — Relation ('R')
  * frames carry (oid, typmod) per column, Type ('Y') frames name any
  * non-builtin oids, and this registry maps the builtin ones to Spark
  * types, so no caller schema is needed (it remains available as an
  * override via [[TypedView.project]]).
  *
  * OIDs are PostgreSQL's stable public catalog constants
  * (`pg_type.dat`); the mapping policy:
  *  - exact numerics: int2/int4/int8 → Short/Integer/Long; numeric →
  *    Decimal with precision/scale unpacked from the typmod
  *    (`((typmod − 4) >> 16, (typmod − 4) & 0xffff)`; typmod −1 =
  *    unconstrained → (38, 18), Spark's max precision with a generous
  *    scale);
  *  - float4/float8 → Float/Double; bool → Boolean; date → Date;
  *  - timestamp (1114, no zone) → TimestampNTZ — the faithful
  *    mapping; timestamptz (1184) → Timestamp (session-zone instant);
  *  - text/varchar/bpchar/name/char + json/jsonb/xml/uuid → String
  *    (length typmods are constraints, not storage, and Spark
  *    Var/Char types are discouraged outside table DDL);
  *  - bytea → Binary ([[TypedView.typedField]] decodes the `\x` hex
  *    wire form);
  *  - anything else (arrays, ranges, enums, composites — including
  *    'Y'-announced custom types) → String, keeping the wire text
  *    lossless, with the source-side type name recorded in the field
  *    metadata so consumers can dispatch on it. */
object PgTypes {

  /** Spark type for a builtin OID, or None when not builtin (custom
    * types keep wire text — see [[schemaFor]]). */
  def dataTypeFor(typeId: Int, typeMod: Int): Option[DataType] = typeId match {
    case 16 => Some(BooleanType) // bool
    case 17 => Some(BinaryType) // bytea
    case 18 | 19 | 25 | 1042 | 1043 => Some(StringType) // "char", name, text, bpchar, varchar
    case 20 => Some(LongType) // int8
    case 21 => Some(ShortType) // int2
    case 23 => Some(IntegerType) // int4
    case 114 | 142 | 2950 | 3802 => Some(StringType) // json, xml, uuid, jsonb
    case 700 => Some(FloatType) // float4
    case 701 => Some(DoubleType) // float8
    case 1082 => Some(DateType) // date
    case 1083 | 1266 => Some(StringType) // time / timetz (no Spark time type)
    case 1114 => Some(TimestampNTZType) // timestamp (without time zone)
    case 1184 => Some(TimestampType) // timestamptz
    case 1700 => Some(numericType(typeMod)) // numeric
    case _ => None
  }

  /** `numeric(p,s)` from the PG typmod: `(p << 16 | s) + VARHDRSZ(4)`
    * when constrained, −1 when not. Precision above Spark's 38 cap
    * (PG allows 1000) falls back to the unconstrained mapping. */
  private def numericType(typeMod: Int): DecimalType =
    if (typeMod == -1) DecimalType(38, 18)
    else {
      val packed = typeMod - 4
      val p = (packed >> 16) & 0xffff
      val s = packed & 0xffff
      if (p >= 1 && p <= DecimalType.MAX_PRECISION && s >= 0 && s <= p) DecimalType(p, s)
      else DecimalType(38, 18)
    }

  /** Derive a relation's Spark schema FROM THE WIRE: builtin OIDs map
    * through [[dataTypeFor]]; non-builtin OIDs keep their wire text as
    * String. Every field's metadata records `pgTypeOid` plus, for
    * 'Y'-announced custom types, the qualified source-side
    * `pgTypeName` — so a consumer that knows how to parse e.g.
    * `public.hstore` can find its columns without the source catalog. */
  def schemaFor(
      rel: RelationInfo,
      types: collection.Map[Int, TypeInfo] = Map.empty): StructType =
    StructType(rel.columns.map { c =>
      val dt = dataTypeFor(c.typeId, c.typeMod)
      val mb = new MetadataBuilder().putLong("pgTypeOid", c.typeId.toLong)
      types.get(c.typeId).foreach(t => mb.putString("pgTypeName", s"${t.namespace}.${t.name}"))
      StructField(c.name, dt.getOrElse(StringType), nullable = true, metadata = mb.build())
    })
}
