from .png import write_png, read_png
from .timer import PerformanceTimer
