"""Sources & sinks: ontology parsing, synthetic fixtures, document
readers, bucketed triple-table sinks."""
