from cdc_stream_processor_spark.sources.batch import TABLES, load_table, load_tables  # noqa: F401
from cdc_stream_processor_spark.sources.cdc_sim import (  # noqa: F401
    accounts_envelopes_from_customers,
    transaction_envelopes_from_events,
)
