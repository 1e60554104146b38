package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.model.SchemaMismatchException

class CdmSchemaSpec extends AnyFlatSpec with Matchers {

  private def entityJson(attrs: String, extraDefs: String = ""): String =
    s"""{"jsonSchemaSemanticVersion":"1.4.0","imports":[],
       |"definitions":[
       |  {"entityName":"Entity","hasAttributes":[$attrs]}$extraDefs
       |]}""".stripMargin

  behavior of "CdmSchema.fromJson"

  it should "map CDM primitives to Spark types (incl. the noyes/time/guid quirks)" in {
    val schema = CdmSchema.fromJson(entityJson(
      """{"name":"s","dataFormat":"String"},
        |{"name":"dt","dataFormat":"DateTime"},
        |{"name":"i64","dataFormat":"Int64"},
        |{"name":"i32","dataFormat":"Int32"},
        |{"name":"dec","dataFormat":"Decimal"},
        |{"name":"yn","dataFormat":"NoYes"},
        |{"name":"t","dataFormat":"Time"},
        |{"name":"g","dataFormat":"Guid"},
        |{"name":"b","dataFormat":"Binary"}""".stripMargin))
    schema.fields.map(f => (f.name, f.dataType)).toSeq shouldBe Seq(
      ("s", StringType), ("dt", TimestampType), ("i64", LongType),
      ("i32", IntegerType), ("dec", DecimalType(38, 18)),
      ("yn", IntegerType), ("t", IntegerType), ("g", StringType),
      ("b", StringType))
  }

  it should "resolve user-defined types recursively via extendsDataType" in {
    // two-level chain, mirroring the reference's nested custom type
    // sample (SimpleCdmAttribute.cs:105-118)
    val schema = CdmSchema.fromJson(entityJson(
      """{"name":"custom","dataType":"customDataTypeNumber"}""",
      """,{"dataTypeName":"customDataTypeNumber","extendsDataType":"nestedCustomDataTypeNumber"},
        |{"dataTypeName":"nestedCustomDataTypeNumber","extendsDataType":"string"}""".stripMargin))
    schema.fields.head.dataType shouldBe StringType
  }

  it should "throw on an unknown primitive type" in {
    val e = intercept[IllegalArgumentException] {
      CdmSchema.fromJson(entityJson("""{"name":"x","dataType":"UnknownType"}"""))
    }
    e.getMessage should include("Unknown CDM primitive type")
  }

  it should "throw on cyclic custom types" in {
    intercept[IllegalArgumentException] {
      CdmSchema.fromJson(entityJson(
        """{"name":"x","dataType":"a"}""",
        """,{"dataTypeName":"a","extendsDataType":"b"},
          |{"dataTypeName":"b","extendsDataType":"a"}""".stripMargin))
    }
  }

  it should "preserve attribute order (change feeds are positional CSV)" in {
    val schema = CdmSchema.fromJson(entityJson(
      """{"name":"z","dataFormat":"String"},
        |{"name":"a","dataFormat":"Int64"},
        |{"name":"m","dataFormat":"String"}""".stripMargin))
    schema.fieldNames.toSeq shouldBe Seq("z", "a", "m")
  }

  behavior of "SchemaOps drift detection"

  private val frozen = StructType(Seq(
    StructField("a", StringType), StructField("b", LongType)))

  it should "accept a structurally identical schema" in {
    noException should be thrownBy SchemaOps.requireNoDrift(frozen,
      StructType(Seq(StructField("a", StringType), StructField("b", LongType))))
  }

  it should "reject a type change, column-order change, and added column" in {
    // the three drift variants from the reference's fixtures
    // (CdmChangeFeedSourceTests.cs:77-106: .updated /
    // .column_order_changed / .extended)
    val variants = Seq(
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))),
      StructType(Seq(StructField("b", LongType), StructField("a", StringType))),
      StructType(Seq(StructField("a", StringType), StructField("b", LongType),
        StructField("c", StringType))))
    variants.foreach { v =>
      intercept[SchemaMismatchException](SchemaOps.requireNoDrift(frozen, v))
    }
  }

  behavior of "SchemaOps fingerprints"

  it should "be stable and 7-char-prefixed" in {
    SchemaOps.fingerprint(frozen) shouldBe SchemaOps.fingerprint(frozen)
    SchemaOps.fingerprint(frozen) should have length 64
    SchemaOps.shortFingerprint(frozen) shouldBe SchemaOps.fingerprint(frozen).take(7)
  }

  it should "differ when the schema differs" in {
    SchemaOps.fingerprint(frozen) should not be SchemaOps.fingerprint(
      StructType(Seq(StructField("a", StringType))))
  }

  it should "enforce arity against the frozen schema" in {
    intercept[graft.model.SchemaInconsistentException](
      SchemaOps.requireArity(frozen, 3))
    noException should be thrownBy SchemaOps.requireArity(frozen, 2)
  }
}
