"""Shared constants of the STI (semantic table interpretation) pipeline.

Values mirror the reference implementation's constants
(`components/CanonicalTableAnnotator.php:27-58`) so that emitted
annotations are comparable at P/R >= 0.95.
"""

# NER label vocabulary (components/CanonicalTableAnnotator.php:27-37)
NUMBER_NER_LABEL = "NUMBER"
DATE_NER_LABEL = "DATE"
TIME_NER_LABEL = "TIME"
MONEY_NER_LABEL = "MONEY"
PERCENT_NER_LABEL = "PERCENT"
NONE_NER_LABEL = "NONE"
LOCATION_NER_LABEL = "LOCATION"
PERSON_NER_LABEL = "PERSON"
ORGANIZATION_NER_LABEL = "ORGANIZATION"
MISC_NER_LABEL = "MISC"
ORDINAL_NER_LABEL = "ORDINAL"

NER_LABELS = (
    NUMBER_NER_LABEL, DATE_NER_LABEL, TIME_NER_LABEL, MONEY_NER_LABEL,
    PERCENT_NER_LABEL, NONE_NER_LABEL, LOCATION_NER_LABEL, PERSON_NER_LABEL,
    ORGANIZATION_NER_LABEL, MISC_NER_LABEL, ORDINAL_NER_LABEL,
)

# NER label -> DBpedia ontology class (components/CanonicalTableAnnotator.php:40-42)
LOCATION_ONTOLOGY_CLASS = "http://dbpedia.org/ontology/Location"
PERSON_ONTOLOGY_CLASS = "http://dbpedia.org/ontology/Person"
ORGANISATION_ONTOLOGY_CLASS = "http://dbpedia.org/ontology/Organisation"

NER_CLASS_MAP = {
    LOCATION_NER_LABEL: LOCATION_ONTOLOGY_CLASS,
    PERSON_NER_LABEL: PERSON_ONTOLOGY_CLASS,
    ORGANIZATION_NER_LABEL: ORGANISATION_ONTOLOGY_CLASS,
}

# Literal NER label -> DBpedia resource instance
# (components/CanonicalTableAnnotator.php:43-47)
NUMBER_ONTOLOGY_INSTANCE = "http://dbpedia.org/resource/Number"
MONEY_ONTOLOGY_INSTANCE = "http://dbpedia.org/resource/Money"
PERCENT_ONTOLOGY_INSTANCE = "http://dbpedia.org/resource/Percent"
DATE_ONTOLOGY_INSTANCE = "http://dbpedia.org/resource/Date"
TIME_ONTOLOGY_INSTANCE = "http://dbpedia.org/resource/Time"

# Literal-typed NER label -> fixed instance; the short-circuit path
# (components/CanonicalTableAnnotator.php:913-923,1062-1073)
LITERAL_INSTANCE_MAP = {
    NUMBER_NER_LABEL: NUMBER_ONTOLOGY_INSTANCE,
    PERCENT_NER_LABEL: PERCENT_ONTOLOGY_INSTANCE,
    MONEY_NER_LABEL: MONEY_ONTOLOGY_INSTANCE,
    DATE_NER_LABEL: DATE_ONTOLOGY_INSTANCE,
    TIME_NER_LABEL: TIME_ONTOLOGY_INSTANCE,
}

# URI namespaces (components/CanonicalTableAnnotator.php:52-54)
DBPEDIA_ONTOLOGY_SECTION = "http://dbpedia.org/ontology/"
DBPEDIA_RESOURCE_SECTION = "http://dbpedia.org/resource/"
DBPEDIA_PROPERTY_SECTION = "http://dbpedia.org/property/"

ALL_URI_SECTIONS = (
    DBPEDIA_ONTOLOGY_SECTION,
    DBPEDIA_RESOURCE_SECTION,
    DBPEDIA_PROPERTY_SECTION,
)

# Canonical-table logical column names
# (components/CanonicalTableAnnotator.php:56-58)
DATA_TITLE = "DATA"
ROW_HEADING_TITLE = "RowHeading"
COLUMN_HEADING_TITLE = "ColumnHeading"

# Multi-label join convention (split at components/CanonicalTableAnnotator.php:888)
LABEL_SEP = " | "

# cell_value.type codes (modules/main/models/CellValue.php:24-26)
CELL_DATA = 0
CELL_ROW_HEADING = 1
CELL_COLUMN_HEADING = 2
