package org.apache.spark.sql.execution.datasources.parquet

import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.MessageType

/** Bridge into Spark's parquet package: `ParquetRowGroupReader` (the
  * hook that lets a caller hand [[VectorizedParquetRecordReader]] an
  * explicit row-group sequence) is package-private, so the graft
  * connector's row-group pruning enters through here. The
  * `ParquetFileReader` is opened by the caller with a row-group filter;
  * this adapter only forwards its surviving groups.
  */
object GraftRowGroups {
  def init(reader: VectorizedParquetRecordReader, fileSchema: MessageType,
      requestedSchema: MessageType, pf: ParquetFileReader,
      totalRowCount: Int): Unit =
    reader.initialize(fileSchema, requestedSchema,
      new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
        override def readNextRowGroup(): PageReadStore = pf.readNextRowGroup()
        override def close(): Unit = pf.close()
      }, totalRowCount)
}
