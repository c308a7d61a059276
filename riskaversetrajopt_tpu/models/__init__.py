from riskaversetrajopt_tpu.models.drone import DroneModel  # noqa: F401
from riskaversetrajopt_tpu.models.car import CarModel  # noqa: F401
