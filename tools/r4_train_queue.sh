#!/bin/bash
# Round-4 production training queue (run in background; one TPU, so the
# runs are strictly sequential). Logs under /tmp/r4_*.log.
set -u
cd /root/repo

# wait for any in-flight train_demo run to finish first
while pgrep -f "tools/train_demo.py" > /dev/null; do sleep 30; done

# 1. ship the scale warm-start result if it beat the shipped weights
python - <<'EOF'
import json, shutil, os
src = "/tmp/scale_warm.json"
if os.path.exists(src + ".provenance.json"):
    prov = json.load(open(src + ".provenance.json"))
    new, old = prov["heldout_y_psnr_db"], prov.get("heldout_prev_shipped_db")
    if old is None or new > old:
        shutil.copyfile(src, "models/scale2.0x_demo.json")
        shutil.copyfile(src + ".provenance.json",
                        "models/scale2.0x_demo.json.provenance.json")
        print(f"shipped scale: {old} -> {new} dB")
    else:
        print(f"kept shipped scale ({old} dB >= {new} dB)")
EOF

# 2-3. noise models from scratch (the shipped ones barely beat the noisy
# input under the robust protocol: +0.1 / +2.1 dB)
python tools/train_demo.py --kind noise --noise_level 1 --steps 20000 \
  --batch 32 --crop 96 --images 1024 --imgsize 192 --lr 2.5e-4 --clip 1.0 \
  --ema 0.999 --eval_every 2000 --workers 10 --seed 21 \
  --out models/noise1_demo.json > /tmp/r4_noise1.log 2>&1

python tools/train_demo.py --kind noise --noise_level 2 --steps 20000 \
  --batch 32 --crop 96 --images 1024 --imgsize 192 --lr 2.5e-4 --clip 1.0 \
  --ema 0.999 --eval_every 2000 --workers 10 --seed 22 \
  --out models/noise2_demo.json > /tmp/r4_noise2.log 2>&1

# 4. ceiling probe: 2x-wide 7-layer on identical data/protocol
python tools/train_demo.py --kind scale --steps 14000 \
  --widths 1,64,64,128,128,256,256,1 \
  --batch 32 --crop 96 --images 1024 --imgsize 192 --lr 2.5e-4 --clip 1.0 \
  --ema 0.999 --eval_every 2000 --workers 10 --seed 31 \
  --out /tmp/scale_wide.json > /tmp/r4_wide.log 2>&1

# 5. int8-L6 QAT finetune from the shipped scale weights (not auto-shipped)
python tools/train_demo.py --kind scale --steps 8000 \
  --init models/scale2.0x_demo.json --qat_mu 4.0 \
  --batch 32 --crop 96 --images 1024 --imgsize 192 --lr 5e-5 --clip 1.0 \
  --ema 0.999 --eval_every 1000 --workers 10 --seed 41 \
  --out /tmp/scale_qat.json > /tmp/r4_qat.log 2>&1

echo "r4 training queue complete" > /tmp/r4_queue_done
