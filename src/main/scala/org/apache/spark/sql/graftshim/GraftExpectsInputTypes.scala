package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.sql.types.{AbstractDataType, DataType, TypeCollection}

/** Bridge to Catalyst's `ExpectsInputTypes`: `AbstractDataType` and
  * `TypeCollection` are `private[sql]` in Spark 4, so expression classes
  * outside `org.apache.spark.sql` can't name them. This trait (compiled
  * inside the sql package tree) lets them declare input types with public
  * `DataType`s only: each entry of [[graftInputTypes]] is the list of
  * accepted types for that child (one element = exact type, several =
  * any-of). Mistyped inputs then fail at analysis time instead of being
  * silently misread through `ArrayData` accessors. */
trait GraftExpectsInputTypes extends ExpectsInputTypes {
  def graftInputTypes: Seq[Seq[DataType]]

  override def inputTypes: Seq[AbstractDataType] =
    graftInputTypes.map {
      case Seq(one) => one
      case many     => TypeCollection(many: _*)
    }
}
