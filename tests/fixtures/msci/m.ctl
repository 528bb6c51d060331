seed = 3
seqfile = d.txt
Imapfile = d.imap
jobname = out
species&tree = 3 A B C
               2 2 2
               ((A,(B)H[&phi=0.4,&tau-parent=yes]),(H[&tau-parent=yes],C))R;
usedata = 0
nloci = 1
thetaprior = gamma 2 200
tauprior = gamma 2 100
phiprior = 1 1
finetune = 1
burnin = 200
sampfreq = 2
nsample = 2000
