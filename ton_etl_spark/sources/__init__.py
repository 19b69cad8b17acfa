"""External-format sources: readers/writers for interchange formats the
reference lake uses (Avro object container files) expressed Spark-first."""
