"""sbustreamspot-core-spark: a PySpark-native link-graph analytics engine.

Re-expresses the capabilities of sbustreamspot/sbustreamspot-core (KDD-2016
StreamSpot: streaming heterogeneous-graph sketching, clustering, anomaly
detection) as idiomatic Spark DataFrame / pandas-UDF / iterative-superstep
jobs, plus the standard link-graph suite (PageRank, connected components,
label propagation, triangle counting) and a web-page -> edge-table front end.
"""

from .config import GraphParams, StreamSpotParams

__all__ = ["GraphParams", "StreamSpotParams"]
__version__ = "0.1.0"
