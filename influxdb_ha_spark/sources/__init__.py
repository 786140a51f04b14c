from .partitioned import (choose_layout, load_partitioned,  # noqa: F401
                          write_partitioned)
