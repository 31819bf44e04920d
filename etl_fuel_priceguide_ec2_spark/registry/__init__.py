"""Named query registry (package form of the former single-file
registry.py; split per operator family for auditability — behavior,
names, and registration ORDER are unchanged).

Public API: ``queries()`` / ``oracle_sql()`` / ``register`` — see
``base.py``. Submodule import order below IS the registration order;
the driver checks the first 50 ``queries()`` entries per round, so
``base._ROUND_PRIORITY`` (the rotation schedule) plus this order are
load-bearing. Do not reorder imports casually.
"""

from etl_fuel_priceguide_ec2_spark.registry.base import (  # noqa: F401
    AS_OF,
    FIXED_NOW,
    SNAP_A_END,
    SNAP_B_END,
    Builder,
    oracle_sql,
    queries,
    register,
)

# ordered side-effect imports: each module registers its queries
from etl_fuel_priceguide_ec2_spark.registry import flagship_asof  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import core_etl  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import analytics  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import dedup_family  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import docs_ai  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import windows_depth  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import aggregates_ext  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import text_ml  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import robustness  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import subquery_dates  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import curation  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import scd_windows  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import batteries  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import analytics_depth  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import tpch_shapes  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import sampling_splits  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import semantic  # noqa: F401,E402
from etl_fuel_priceguide_ec2_spark.registry import sketches  # noqa: F401,E402

# helpers used by tools/ (kept importable from the package root)
from etl_fuel_priceguide_ec2_spark.registry.dedup_family import (  # noqa: F401,E402
    _boilerplate_docs,
)
