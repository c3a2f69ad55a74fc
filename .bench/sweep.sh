cd /root/repo
run() { env "$@" timeout 900 python .bench/sweep_forcing.py 3 2>&1 | grep "^L="; }
run                                                  # A default
run MGBTPU_IR_RTOL=1e-6                              # B
run MGBTPU_IR_RTOL=1e-5                              # C
run MGBTPU_FORCING_RTOL=1e-2                         # D
run MGBTPU_IR_TAU=8                                  # E
run MGBTPU_IR_RTOL=1e-5 MGBTPU_FORCING_RTOL=1e-2     # F
