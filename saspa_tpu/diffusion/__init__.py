from saspa_tpu.diffusion.schedulers import DDIMScheduler, UniPCScheduler, SchedulerConfig
