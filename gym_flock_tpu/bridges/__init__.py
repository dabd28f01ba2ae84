from gym_flock_tpu.bridges.airsim_bridge import (
    AirsimFlockingBridge,
    AirsimCoverageBridge,
    quaternion_to_yaw,
)
from gym_flock_tpu.bridges.ros_bridge import RosCoverageDriver
