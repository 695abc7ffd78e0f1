from .compilation_cache import enable_compilation_cache
from .tensorboard import SummaryWriter
from .tools import (average_or_nan, count_summary, distinct, duplicates, extension, group,
                    home_directory, log, logger, mkdir, name_without_extension, paginate,
                    read_text, single, single_or_none, timestamp, write_text)

__all__ = ["average_or_nan", "count_summary", "distinct", "duplicates", "extension", "group",
           "home_directory", "log", "logger", "mkdir", "name_without_extension", "paginate",
           "read_text", "single", "single_or_none", "timestamp", "write_text",
           "SummaryWriter", "enable_compilation_cache"]
