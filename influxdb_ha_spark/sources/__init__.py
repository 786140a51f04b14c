from .partitioned import (choose_layout, load_partitioned,  # noqa: F401
                          rebalance_measurement, write_partitioned)
