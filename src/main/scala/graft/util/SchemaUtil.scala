package graft.util

import org.apache.spark.sql.types.{DataType, StructType}

object SchemaUtil {
  def fromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]
}
